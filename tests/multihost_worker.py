"""Worker + shared config for the 2-process jax.distributed CPU test.

Launched by tests/test_multihost.py as TWO subprocesses (one per
process_id) against a localhost coordinator, with gloo CPU collectives and
ONE local CPU device each — the standard JAX answer to exercising the real
multi-host code path (process-local batch assembly via
jax.make_array_from_process_local_data, cross-process psum) without a pod.

The training math is deliberately tiny and fully deterministic so the
2-process run must reproduce the single-process losses exactly (up to float
reduction order).
"""

import json
import os
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

GLOBAL_BATCH = 32
STEPS = 5


def specs():
    from deep_recommenders_tpu.features import Feature

    return (
        Feature("u", hash_buckets=40),
        Feature("g", vocab=("F", "M")),
        Feature("m", hash_buckets=50),
        Feature("tags", vocab=tuple(range(7)), max_len=3),
    )


def global_batch(step):
    """The step-th deterministic GLOBAL batch (same on every process)."""
    import numpy as np

    rng = np.random.default_rng(1000 + step)
    b = GLOBAL_BATCH
    feats = {
        "u": rng.integers(0, 40, b).astype(np.int32),
        "g": rng.integers(0, 3, b).astype(np.int32),
        "m": rng.integers(0, 50, b).astype(np.int32),
        "tags": rng.integers(0, 8, (b, 3)).astype(np.int32),
        "tags__wt": (rng.random((b, 3)) < 0.8).astype(np.float32),
    }
    labels = (rng.random((b, 1)) < 0.5).astype(np.float32)
    return feats, labels


def train_losses(mesh, row_lo=0, row_hi=GLOBAL_BATCH):
    """Train DeepFM for STEPS steps; each process feeds rows [lo, hi) of
    every global batch. Returns the per-step loss list."""
    import optax

    from deep_recommenders_tpu.models.ranking import DeepFM
    from deep_recommenders_tpu.parallel import shard_batch
    from deep_recommenders_tpu.training import Trainer

    model = DeepFM(specs(), embedding_dim=8, hidden=(16,))
    trainer = Trainer(model, optax.sgd(0.5), mesh=mesh, seed=0)
    state = None
    losses = []
    for step in range(STEPS):
        feats, labels = global_batch(step)
        feats = {k: v[row_lo:row_hi] for k, v in feats.items()}
        labels = labels[row_lo:row_hi]
        b = shard_batch(feats, mesh)
        l = shard_batch(labels, mesh)
        if state is None:
            state = trainer.init(b)
        state, loss = trainer.train_step(state, b, l)
        losses.append(float(loss))
    return losses


def main():
    port, pid, out_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2,
        process_id=pid,
    )
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 2, jax.devices()

    sys.path.insert(0, REPO)
    from deep_recommenders_tpu.parallel import MeshConfig, create_mesh

    mesh = create_mesh(MeshConfig(data=2, model=1))
    half = GLOBAL_BATCH // 2
    losses = train_losses(mesh, row_lo=pid * half, row_hi=(pid + 1) * half)
    if pid == 0:
        with open(out_path, "w") as f:
            json.dump(losses, f)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
