"""Two-tower retrieval quality: recall@k against the FULL movie corpus.

Pins the retrieval north-star row of BASELINE.md (VERDICT round-2 #4): the
FactorizedTopK accuracy bank (k in {1, 5, 10, 50, 100}, ref
factorized_top_k.py:475-480 semantics) measured over the test positives with
every unique movie in the test split as a candidate, plus train
examples/s/chip.

Round 4 (VERDICT r3 Weak #7): training runs through the SAME device-resident
Trainer.fit_device loop as examples/train_two_tower_on_movielens.py — the
committed artifact's throughput is the real device-resident number, not a
host-fed loop's — and the artifact records the full config.

Usage: python benchmarks/two_tower_quality.py [--epochs 5] [--out path.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import optax

from deep_recommenders_tpu.datasets import MovielensRanking
from deep_recommenders_tpu.models.retrieval import (
    FactorizedTopK,
    Retrieval,
    TwoTower,
)
from deep_recommenders_tpu.training import (
    DeviceData,
    RetrievalEval,
    Trainer,
    retrieval_loss,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--batch-size", type=int, default=1024)
    p.add_argument("--num-ratings", type=int, default=1_000_209)
    p.add_argument("--temperature", type=float, default=0.1)
    p.add_argument("--learning-rate", type=float, default=0.05)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument(
        "--movie-popularity", default="rank-power",
        help="synthetic movie marginal; rank-power (finite skew, full "
        "movie coverage) is the retrieval-parity protocol on BOTH sides",
    )
    p.add_argument("--out", default=None)
    args = p.parse_args()

    ds = MovielensRanking(
        batch_size=args.batch_size,
        num_ratings=args.num_ratings,
        seed=args.seed,
        movie_popularity=args.movie_popularity,
    )
    user, item, ids = ds.retrieval_arrays("train")
    # Empirical per-positive sampling probability (logQ correction) — on a
    # popularity-skewed corpus the uncorrected in-batch softmax learns
    # popularity-cancelled scores that rank the full corpus near-randomly,
    # and a 2-3%-popular movie appears dozens of times per batch as a false
    # negative of itself (accidental negatives). Ref semantics:
    # sbcnm.py:52-86, both options implemented as intended.
    uniq, inv, counts = np.unique(
        ids, return_inverse=True, return_counts=True
    )
    sampling_prob = (counts[inv] / len(ids)).astype(np.float32)
    labels = {"candidate_ids": ids, "sampling_prob": sampling_prob}
    train = DeviceData.from_numpy((user, item), labels, args.batch_size)
    euser, eitem, eids = ds.retrieval_arrays("test")

    model = TwoTower(
        ds.user_specs(), ds.item_specs(),
        embedding_dim=32, hidden=(64,), output_dim=32,
    )
    task = Retrieval(
        temperature=args.temperature, remove_accidental_negatives=True
    )
    trainer = Trainer(
        model,
        optax.adagrad(args.learning_rate),
        loss_fn=retrieval_loss(model, task),
        eval_spec=RetrievalEval(model, task),
        seed=args.seed,
    )
    result = trainer.fit_device(
        train, epochs=args.epochs, shuffle_seed=args.seed, verbose=True
    )
    params = result["state"].params
    train_ex_per_s = result["examples_per_sec"]
    steady = result.get("examples_per_sec_steady")

    # Full-corpus candidate set: every unique movie seen in the test split
    # (the reference protocol: positives scored against the whole candidate
    # corpus, ref factorized_top_k.py:475-480 + sbcnm.py:156-163).
    # Dedup by RAW movie id — the same corpus definition as the reference
    # harness (VERDICT r4 #6 / ADVICE r4: deduping by encoded CRC32 bucket
    # gave our side a ~1.6x smaller candidate set). Bucket collisions stay
    # inside the model: colliding raw ids contribute identical embeddings
    # and tie-resolution favors the positive, exactly as a shared bucket
    # behaves at serving time.
    raw_ids = ds.raw_movie_ids("test")
    _, first_rows = np.unique(raw_ids, return_index=True)
    corpus_batch = {k: v[first_rows] for k, v in eitem.items()}
    corpus_emb = model.apply(
        params, corpus_batch, method=lambda m, b: m.candidate_tower(b)
    )
    metric = FactorizedTopK(ks=(1, 5, 10, 50, 100))
    state = metric.init()
    for qb, cb in ds.retrieval_batches(split="test"):
        qe, ce = model.apply(params, qb, cb)
        state = metric.update(state, qe, ce, candidates=corpus_emb)
    metrics = {k: round(float(v), 4) for k, v in metric.compute(state).items()}

    result_row = {
        "model": "TwoTower",
        "corpus_movies": int(corpus_emb.shape[0]),
        "config": {
            "num_ratings": args.num_ratings,
            "batch_size": args.batch_size,
            "epochs": args.epochs,
            "embedding_dim": 32,
            "hidden": [64],
            "output_dim": 32,
            "temperature": args.temperature,
            "optimizer": f"adagrad({args.learning_rate})",
            "movie_popularity": args.movie_popularity,
            "loss": "in-batch softmax CE (SUM) + logQ correction + "
                    "accidental-negative removal",
            "seed": args.seed,
            "train_loop": "fit_device (device-resident epoch scans)",
        },
        "train_examples_per_sec_per_chip": round(train_ex_per_s, 0),
        # Wall includes the one-time remote XLA compile; steady is the
        # device-resident rate of epochs 2..N.
        "train_examples_per_sec_per_chip_steady": (
            round(steady, 0) if steady else None
        ),
        **metrics,
    }
    print(json.dumps(result_row))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result_row, f, indent=1)


if __name__ == "__main__":
    main()
