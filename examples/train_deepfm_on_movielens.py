"""Train DeepFM on MovieLens-1M — the headline-AUC config.

Mirrors ref examples/train_deepfm_on_movielens_keras.py:38-54: DeepFM with
hidden (256, 32), Adam, BCE, AUC/Precision/Recall metrics, batch 1024,
0.8/0.2 split, early stopping (patience 3).

With no ml-1m files present this trains on the deterministic synthetic
corpus (same schema and marginals; see datasets/movielens.py). Pass
--datadir to point at a real ml-1m directory.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import optax

from deep_recommenders_tpu.datasets import MovielensRanking
from deep_recommenders_tpu.models.ranking import DeepFM
from deep_recommenders_tpu.training import Trainer


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--datadir", default=None)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=1024)
    p.add_argument("--num-ratings", type=int, default=1_000_209)
    p.add_argument("--embedding-dim", type=int, default=16)
    p.add_argument("--learning-rate", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument(
        "--bf16", action="store_true",
        help="bfloat16 compute (fp32 params/logits/optimizer state); AUC "
        "must land within run-to-run variance of the fp32 number",
    )
    p.add_argument(
        "--host-streaming",
        action="store_true",
        help="feed batches from host per step instead of the "
        "device-resident fast path",
    )
    p.add_argument(
        "--native-loader",
        action="store_true",
        help="with --host-streaming: assemble batches in the C++ "
        "prefetch ring (native/loader.cpp) instead of the Python iterator",
    )
    args = p.parse_args()
    if args.native_loader and not args.host_streaming:
        p.error("--native-loader requires --host-streaming (the C++ ring "
                "feeds the per-step host loop, not the device-resident path)")

    print("Loading MovieLens ...")
    ds = MovielensRanking(
        batch_size=args.batch_size,
        datadir=args.datadir,
        num_ratings=args.num_ratings,
        seed=args.seed,
    )
    print(
        f"train steps/epoch: {ds.train_steps_per_epoch}, "
        f"test steps: {ds.test_steps}"
    )
    import jax.numpy as jnp

    model = DeepFM(
        ds.feature_specs, embedding_dim=args.embedding_dim, hidden=(256, 32),
        compute_dtype=jnp.bfloat16 if args.bf16 else None,
    )
    trainer = Trainer(
        model, optax.adam(args.learning_rate), seed=args.seed
    )
    if args.host_streaming:
        if args.native_loader:
            from deep_recommenders_tpu.native import NativeStreamLoader

            train_feats, train_labels = ds.train_arrays()
            loader = NativeStreamLoader(
                train_feats,
                train_labels,
                ds.batch_size,
                seed=args.seed,
            )
            train_batches = lambda epoch: loader.epoch_batches()  # noqa: E731
        else:
            train_batches = lambda epoch: ds.train_batches(  # noqa: E731
                epochs=1, shuffle_seed=args.seed + epoch
            )
        result = trainer.fit(
            train_batches,
            lambda: ds.test_batches(),
            epochs=args.epochs,
            early_stopping_patience=3,
            log_every=200,
        )
    else:
        from deep_recommenders_tpu.training.data import DeviceData

        train_feats, train_labels = ds.train_arrays()
        test_feats, test_labels = ds.test_arrays()
        train = DeviceData.from_numpy(train_feats, train_labels, ds.batch_size)
        test = DeviceData.from_numpy(test_feats, test_labels, ds.batch_size)
        result = trainer.fit_device(
            train, test, epochs=args.epochs,
            shuffle_seed=args.seed, early_stopping_patience=3,
        )
    final = result["history"][-1]
    print(
        f"final: auc={final['auc']:.4f} precision={final['precision']:.4f} "
        f"recall={final['recall']:.4f} "
        f"({result['examples_per_sec']:.0f} examples/sec)"
    )


if __name__ == "__main__":
    main()
