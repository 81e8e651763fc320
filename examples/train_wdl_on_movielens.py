"""Train Wide&Deep on MovieLens with crossed columns and split optimizers.

Mirrors ref examples/train_wdl_on_movielens_estimator.py: crossed features
(gender x age, gender x occupation, age x occupation; ref :37-47), FTRL with
L1 on the wide scope and Adam on the deep scopes (ref :65-77) via
optax.multi_transform over param paths.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import optax

from deep_recommenders_tpu.datasets import MovielensRanking
from deep_recommenders_tpu.features import CrossedFeature
from deep_recommenders_tpu.models.ranking import WideDeep
from deep_recommenders_tpu.training import Trainer
from deep_recommenders_tpu.training.data import DeviceData
from deep_recommenders_tpu.training.optimizers import ftrl, scoped_optimizer


CROSSES = (
    CrossedFeature("gender_x_age", keys=("user_gender", "user_age"),
                   hash_buckets=14),
    CrossedFeature("gender_x_occupation",
                   keys=("user_gender", "user_occupation"), hash_buckets=42),
    CrossedFeature("age_x_occupation",
                   keys=("user_age", "user_occupation"), hash_buckets=147),
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--datadir", default=None)
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--batch-size", type=int, default=1024)
    p.add_argument("--num-ratings", type=int, default=1_000_209)
    p.add_argument("--embedding-dim", type=int, default=16)
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args()

    ds = MovielensRanking(
        batch_size=args.batch_size,
        datadir=args.datadir,
        num_ratings=args.num_ratings,
        seed=args.seed,
    )
    # Encode the crossed columns from the already-encoded base ids.
    data = dict(ds._data)
    for cf in CROSSES:
        data.update(cf.encode_cross(data))

    wide_specs = ds.feature_specs + CROSSES
    model = WideDeep(
        deep_specs=ds.feature_specs,
        wide_specs=wide_specs,
        embedding_dim=args.embedding_dim,
        hidden=(256, 128, 64),
    )

    # Build optimizer AFTER params exist (multi_transform needs labels).
    n_train = ds.train_steps_per_epoch * ds.batch_size
    train = DeviceData.from_numpy(
        {k: v[:n_train] for k, v in data.items()},
        ds._label[:n_train], ds.batch_size,
    )
    test = DeviceData.from_numpy(
        {k: v[ds._n_train:] for k, v in data.items()},
        ds._label[ds._n_train:], ds.batch_size,
    )
    import jax

    first_batch, _ = train.gather(train.permutation(None, 0)[: ds.batch_size])
    params = model.init(jax.random.PRNGKey(args.seed), first_batch)
    optimizer = scoped_optimizer(
        {"wide": ftrl(learning_rate=0.1, l1_regularization_strength=0.5)},
        optax.adam(1e-3),
        params,
    )
    trainer = Trainer(model, optimizer, seed=args.seed)
    result = trainer.fit_device(
        train, test, epochs=args.epochs, shuffle_seed=args.seed
    )
    final = result["history"][-1]
    wide_w = np.asarray(
        result["state"].params["params"]["wide_linear"]["weights"]
    )
    sparsity = float((wide_w == 0).mean())
    print(
        f"final: auc={final['auc']:.4f} "
        f"wide-weight sparsity (FTRL L1): {sparsity:.2%}"
    )


if __name__ == "__main__":
    main()
