"""Train FNN warm-started from an exported FM checkpoint (two-phase flow).

Mirrors ref examples/train_fnn_on_movielens_estimator.py: phase 1 is
train_fm_on_movielens.py (exports the checkpoint), phase 2 grafts the FM's
linear weights + embeddings into FNN (ref fnn.py:32-48 semantics via
training/warmstart.warm_start_from) and fine-tunes.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import optax

from deep_recommenders_tpu.datasets import MovielensRanking
from deep_recommenders_tpu.models.ranking import FNN, FactorizationMachine
from deep_recommenders_tpu.training import (
    Trainer,
    restore_checkpoint,
    warm_start_from,
)
from deep_recommenders_tpu.training.data import DeviceData


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--datadir", default=None)
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--batch-size", type=int, default=1024)
    p.add_argument("--num-ratings", type=int, default=1_000_209)
    p.add_argument("--embedding-dim", type=int, default=16)
    p.add_argument("--learning-rate", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument(
        "--warm-up-from", default="/tmp/fm_checkpoint",
        help="FM checkpoint path from train_fm_on_movielens.py",
    )
    args = p.parse_args()

    ds = MovielensRanking(
        batch_size=args.batch_size,
        datadir=args.datadir,
        num_ratings=args.num_ratings,
        seed=args.seed,
    )
    model = FNN(
        ds.feature_specs, embedding_dim=args.embedding_dim,
        hidden=(256, 128, 64),
    )
    trainer = Trainer(model, optax.adam(args.learning_rate), seed=args.seed)

    n_train = ds.train_steps_per_epoch * ds.batch_size
    train = DeviceData.from_numpy(
        {k: v[:n_train] for k, v in ds._data.items()},
        ds._label[:n_train], ds.batch_size,
    )
    test = DeviceData.from_numpy(
        {k: v[ds._n_train:] for k, v in ds._data.items()},
        ds._label[ds._n_train:], ds.batch_size,
    )

    # Phase 2: init FNN, then graft FM's "linear" + "embeddings" scopes.
    first_batch, _ = train.gather(train.permutation(None, 0)[: ds.batch_size])
    state = trainer.init(first_batch)
    if args.warm_up_from and os.path.exists(args.warm_up_from):
        fm_template = FactorizationMachine(
            ds.feature_specs, embedding_dim=args.embedding_dim
        ).init(jax.random.PRNGKey(0), first_batch)
        fm_params = restore_checkpoint(args.warm_up_from, fm_template)
        state.params = warm_start_from(state.params, fm_params)
        state.opt_state = trainer.optimizer.init(state.params)
        print(f"warm-started from {args.warm_up_from}")
    else:
        print("no FM checkpoint found; training from scratch")

    # Continue with the standard device-resident loop, reusing the state.
    import jax.numpy as jnp

    batch = ds.batch_size

    @jax.jit
    def run_epoch(state, perm):
        def body(state, step):
            rows = jax.lax.dynamic_slice_in_dim(perm, step * batch, batch)
            b, l = train.gather(rows)
            return trainer.train_step_fn(state, b, l)

        return jax.lax.scan(body, state, jnp.arange(perm.shape[0] // batch))

    for epoch in range(args.epochs):
        perm = train.permutation(args.seed, epoch)
        state, losses = run_epoch(state, perm)
        metrics = trainer.evaluate(
            state.params,
            lambda: (
                ({k: v[lo : lo + batch] for k, v in test.features.items()},
                 test.labels[lo : lo + batch])
                for lo in range(0, test.steps_per_epoch * batch, batch)
            ),
        )
        print(f"epoch {epoch}: loss={float(losses[-1]):.4f} "
              f"auc={metrics['auc']:.4f}")


if __name__ == "__main__":
    main()
