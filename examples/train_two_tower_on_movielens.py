"""Two-tower retrieval on MovieLens with in-batch sampled softmax + recall@k.

The retrieval-stack headline config (BASELINE.json): user tower vs movie
tower, Retrieval loss over in-batch negatives with temperature, evaluated
with the FactorizedTopK accuracy bank (k in {1, 5, 10, 50, 100}) against the
full movie corpus (exact MXU search, no faiss).

Runs through the shared Trainer: device-resident epoch scans over the
positive-pair split (DeviceData of (user, item) tuple batches), in-batch
FactorizedTopK + retrieval val_loss per epoch (RetrievalEval), checkpoint/
resume via --checkpoint-dir. The full-corpus recall pass at the end stays a
separate offline step because the corpus embedding depends on the params.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
    p.add_argument("--datadir", default=None)
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--batch-size", type=int, default=1024)
    p.add_argument("--num-ratings", type=int, default=1_000_209)
    p.add_argument("--embedding-dim", type=int, default=32)
    p.add_argument("--output-dim", type=int, default=32)
    p.add_argument("--temperature", type=float, default=0.1)
    p.add_argument("--learning-rate", type=float, default=0.05)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument(
        "--movie-popularity", default="rank-power",
        help="synthetic-corpus movie marginal (retrieval needs the "
        "finite-skew rank-power form; see datasets/movielens.py)",
    )
    args = p.parse_args()

    print("Loading MovieLens ...")
    ds = MovielensRanking(
        batch_size=args.batch_size,
        datadir=args.datadir,
        num_ratings=args.num_ratings,
        seed=args.seed,
        movie_popularity=args.movie_popularity,
    )
    user, item, ids = ds.retrieval_arrays("train")
    # logQ correction + accidental-negative removal (the reference's
    # documented-but-broken Retrieval options, implemented as intended):
    # on a popularity-skewed corpus, plain in-batch softmax learns
    # popularity-cancelled scores that rank the full corpus near-randomly
    # (see BASELINE.md round-4 retrieval section).
    uniq, inv, counts = np.unique(ids, return_inverse=True,
                                  return_counts=True)
    sampling_prob = (counts[inv] / len(ids)).astype(np.float32)
    train = DeviceData.from_numpy(
        (user, item),
        {"candidate_ids": ids, "sampling_prob": sampling_prob},
        args.batch_size,
    )
    euser, eitem, eids = ds.retrieval_arrays("test")
    evald = DeviceData.from_numpy(
        (euser, eitem), {"candidate_ids": eids}, args.batch_size
    )

    model = TwoTower(
        ds.user_specs(),
        ds.item_specs(),
        embedding_dim=args.embedding_dim,
        hidden=(64,),
        output_dim=args.output_dim,
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
        train,
        eval_data=evald,
        epochs=args.epochs,
        shuffle_seed=args.seed,
        monitor="val_loss",
        monitor_mode="min",
        checkpoint_dir=args.checkpoint_dir,
    )
    params = result["state"].params

    # Eval: recall@k of the true watched movie against the full movie corpus.
    # Unique movies across the test positives, vectorized via np.unique.
    _, first_rows = np.unique(eitem["movie_id"], return_index=True)
    corpus_batch = {k: v[first_rows] for k, v in eitem.items()}
    corpus_emb = model.apply(
        params, corpus_batch, method=lambda m, b: m.candidate_tower(b)
    )
    metric = FactorizedTopK(ks=(1, 5, 10, 50, 100))
    state = metric.init()
    for qb, cb in ds.retrieval_batches(split="test"):
        qe, ce = model.apply(params, qb, cb)
        state = metric.update(state, qe, ce, candidates=corpus_emb)
    out = {k: float(v) for k, v in metric.compute(state).items()}
    print("retrieval metrics:", {k: round(v, 4) for k, v in out.items()})


if __name__ == "__main__":
    main()
