"""Two-tower retrieval on MovieLens with in-batch sampled softmax + recall@k.

The retrieval-stack headline config (BASELINE.json): user tower vs movie
tower, Retrieval loss over in-batch negatives with temperature, evaluated
with the FactorizedTopK accuracy bank (k in {1, 5, 10, 50, 100}) against the
full movie corpus (exact MXU search, no faiss).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
    p.add_argument("--datadir", default=None)
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--batch-size", type=int, default=1024)
    p.add_argument("--num-ratings", type=int, default=1_000_209)
    p.add_argument("--embedding-dim", type=int, default=32)
    p.add_argument("--output-dim", type=int, default=32)
    p.add_argument("--temperature", type=float, default=0.1)
    p.add_argument("--learning-rate", type=float, default=0.05)
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args()

    print("Loading MovieLens ...")
    ds = MovielensRanking(
        batch_size=args.batch_size,
        datadir=args.datadir,
        num_ratings=args.num_ratings,
        seed=args.seed,
    )
    model = TwoTower(
        ds.user_specs(),
        ds.item_specs(),
        embedding_dim=args.embedding_dim,
        hidden=(64,),
        output_dim=args.output_dim,
    )
    task = Retrieval(temperature=args.temperature)
    opt = optax.adagrad(args.learning_rate)

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

    t0 = time.perf_counter()
    examples = step = 0
    for epoch in range(args.epochs):
        for qb, cb in ds.retrieval_batches(shuffle_seed=args.seed + epoch):
            params, opt_state, loss = train_step(params, opt_state, qb, cb)
            examples += args.batch_size
            step += 1
            if step % 200 == 0:
                el = time.perf_counter() - t0
                print(
                    f"step {step} loss {float(loss):.3f} "
                    f"({examples / el:.0f} ex/s)"
                )
        print(f"epoch {epoch} loss {float(loss):.3f}")

    # Eval: recall@k of the true watched movie against the full movie corpus.
    # Unique movies across the test positives, vectorized via np.unique.
    item_cols = [cb_ for _, cb_ in ds.retrieval_batches(split="test")]
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
    out = {k: float(v) for k, v in metric.compute(state).items()}
    print("retrieval metrics:", {k: round(v, 4) for k, v in out.items()})


if __name__ == "__main__":
    main()
