"""Train FM on MovieLens and export a checkpoint for FNN warm start.

Mirrors ref examples/train_fm_on_movielens_estimator.py: sigmoid-CE on
logits, AUC metric, and a model export consumed by the FNN example
(the SavedModel at ref :74-80 becomes an Orbax checkpoint here).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import optax

from deep_recommenders_tpu.datasets import MovielensRanking
from deep_recommenders_tpu.models.ranking import FactorizationMachine
from deep_recommenders_tpu.training import Trainer, save_checkpoint
from deep_recommenders_tpu.training.data import DeviceData


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--datadir", default=None)
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--batch-size", type=int, default=1024)
    p.add_argument("--num-ratings", type=int, default=1_000_209)
    p.add_argument("--embedding-dim", type=int, default=16)
    p.add_argument("--learning-rate", type=float, default=1e-2)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--export", default="/tmp/fm_checkpoint")
    args = p.parse_args()

    ds = MovielensRanking(
        batch_size=args.batch_size,
        datadir=args.datadir,
        num_ratings=args.num_ratings,
        seed=args.seed,
    )
    model = FactorizationMachine(
        ds.feature_specs, embedding_dim=args.embedding_dim
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
    result = trainer.fit_device(
        train, test, epochs=args.epochs, shuffle_seed=args.seed
    )
    final = result["history"][-1]
    print(f"final: auc={final['auc']:.4f}")
    if args.export:
        path = save_checkpoint(args.export, result["state"].params)
        print(f"exported FM params to {path}")


if __name__ == "__main__":
    main()
