"""Two-tower retrieval quality: recall@k against the FULL movie corpus.

Pins the retrieval north-star row of BASELINE.md (VERDICT round-2 #4): the
FactorizedTopK accuracy bank (k in {1, 5, 10, 50, 100}, ref
factorized_top_k.py:475-480 semantics) measured over the test positives with
every unique movie in the corpus as a candidate, plus train examples/s/chip.

Usage: python benchmarks/two_tower_quality.py [--epochs 5] [--out path.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np
import optax

from deep_recommenders_tpu.datasets import MovielensRanking
from deep_recommenders_tpu.models.retrieval import (
    FactorizedTopK,
    Retrieval,
    TwoTower,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--batch-size", type=int, default=1024)
    p.add_argument("--num-ratings", type=int, default=1_000_209)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    ds = MovielensRanking(
        batch_size=args.batch_size,
        num_ratings=args.num_ratings,
        seed=args.seed,
    )
    model = TwoTower(
        ds.user_specs(), ds.item_specs(),
        embedding_dim=32, hidden=(64,), output_dim=32,
    )
    task = Retrieval(temperature=0.1)
    opt = optax.adagrad(0.05)
    qb, cb = next(iter(ds.retrieval_batches()))
    params = model.init(jax.random.PRNGKey(args.seed), qb, cb)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, qb, cb):
        def loss_fn(p):
            qe, ce = model.apply(p, qb, cb, training=True)
            return task(qe, ce)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    # Warmup/compile outside the timed window.
    params, opt_state, loss = train_step(params, opt_state, qb, cb)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    examples = 0
    for epoch in range(args.epochs):
        for qb, cb in ds.retrieval_batches(shuffle_seed=args.seed + epoch):
            params, opt_state, loss = train_step(params, opt_state, qb, cb)
            examples += args.batch_size
    jax.block_until_ready(loss)
    train_ex_per_s = examples / (time.perf_counter() - t0)

    # Full-corpus candidate set: every unique movie seen in the test split.
    item_cols = [c for _, c in ds.retrieval_batches(split="test")]
    stacked = {
        k: np.concatenate([c[k] for c in item_cols]) for k in item_cols[0]
    }
    _, first_rows = np.unique(stacked["movie_id"], return_index=True)
    corpus_batch = {k: v[first_rows] for k, v in stacked.items()}
    corpus_emb = model.apply(
        params, corpus_batch, method=lambda m, b: m.candidate_tower(b)
    )
    metric = FactorizedTopK(ks=(1, 5, 10, 50, 100))
    state = metric.init()
    for qb, cb in ds.retrieval_batches(split="test"):
        qe, ce = model.apply(params, qb, cb)
        state = metric.update(state, qe, ce, candidates=corpus_emb)
    metrics = {k: round(float(v), 4) for k, v in metric.compute(state).items()}

    result = {
        "model": "TwoTower",
        "corpus_movies": int(corpus_emb.shape[0]),
        "epochs": args.epochs,
        "train_examples_per_sec_per_chip": round(train_ex_per_s, 0),
        **metrics,
    }
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
