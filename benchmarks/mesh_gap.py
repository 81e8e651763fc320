"""Mesh-path overhead benchmark: DeepFM train step, mesh=1-device vs mesh=None.

Round-2 parity bar (VERDICT next-round #1): the explicit shard_map embedding
exchange must compile essentially the same fused formulation as the
single-chip path — one table pass carrying embeddings + linear terms, the
small-vocab block-diagonal matmul, one psum. This script measures the
residual gap on one real chip (mesh of 1 device = full exchange machinery,
zero actual communication). Target: <10%.

Run on the TPU: ``python benchmarks/mesh_gap.py``
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.trace_timing import fence  # noqa: E402


BATCH = 8192
STEPS = 64
REPEATS = 8


def build(mesh):
    import jax
    import optax

    from deep_recommenders_tpu.features import Feature
    from deep_recommenders_tpu.models.ranking import DeepFM
    from deep_recommenders_tpu.training import Trainer

    specs = (
        Feature("user_id", hash_buckets=6040),
        Feature("user_gender", vocab=("F", "M")),
        Feature("user_age", vocab=(1, 18, 25, 35, 45, 50, 56)),
        Feature("user_occupation", vocab=tuple(range(21))),
        Feature("movie_id", hash_buckets=3952),
        Feature("movie_genres", vocab=tuple(range(18)), max_len=6),
    )
    rng = np.random.default_rng(0)
    n = BATCH
    batch = {
        "user_id": rng.integers(0, 6040, n).astype(np.int32),
        "user_gender": rng.integers(0, 2, n).astype(np.int32),
        "user_age": rng.integers(0, 7, n).astype(np.int32),
        "user_occupation": rng.integers(0, 21, n).astype(np.int32),
        "movie_id": rng.integers(0, 3952, n).astype(np.int32),
        "movie_genres": rng.integers(0, 18, (n, 6)).astype(np.int32),
        "movie_genres__wt": (rng.random((n, 6)) < 0.5).astype(np.float32),
    }
    labels = (rng.random((n, 1)) < 0.5).astype(np.float32)
    model = DeepFM(specs, embedding_dim=16, hidden=(256, 32), mesh=mesh)
    trainer = Trainer(model, optax.adam(1e-3), mesh=mesh, seed=0)
    from deep_recommenders_tpu.parallel import shard_batch

    b = shard_batch(batch, mesh)
    l = shard_batch(labels, mesh)
    state = trainer.init(b)
    if mesh is not None:
        from deep_recommenders_tpu.parallel import table_sharding

        tbl = state.params["params"]["embeddings"]["table"]
        state.params["params"]["embeddings"]["table"] = jax.device_put(
            tbl, table_sharding(mesh)
        )
        state.opt_state = trainer.optimizer.init(state.params)
        # Pin the carry's mesh shardings (stable scan carry + stable
        # dispatch signature) and place the state on them so the FIRST
        # dispatch already matches — otherwise the 2nd dispatch recompiles
        # mid-timing and the bench measures compile, not steps.
        trainer.set_state_constraint(state)
        state = trainer.place_state(state)

    step = trainer.train_step_fn

    def run_raw(state):
        import jax.numpy as jnp

        def body(s, _):
            return step(s, b, l)

        return jax.lax.scan(body, state, jnp.arange(STEPS))

    # Pin out_shardings so chained dispatches keep the input signature —
    # without this the output spec flips and the 2nd dispatch recompiles
    # (a one-time multi-second stall that is NOT steady-state step cost).
    out = trainer.output_shardings()
    run = jax.jit(
        run_raw,
        donate_argnums=(0,),
        **({"out_shardings": out} if out is not None else {}),
    )
    return run, state


def time_path(mesh):
    import jax

    run, state = build(mesh)
    state, losses = run(state)
    fence(losses)
    t0 = time.perf_counter()
    for _ in range(REPEATS):
        state, losses = run(state)
    fence(losses)
    dt = time.perf_counter() - t0
    return STEPS * REPEATS * BATCH / dt


def main():
    from deep_recommenders_tpu.parallel import MeshConfig, create_mesh

    dense = time_path(None)
    mesh = create_mesh(MeshConfig(data=1, model=1))
    meshed = time_path(mesh)
    print(
        json.dumps(
            {
                "dense_ex_per_s": round(dense, 1),
                "mesh1_ex_per_s": round(meshed, 1),
                "mesh_over_dense": round(meshed / dense, 4),
                "gap_pct": round((1 - meshed / dense) * 100, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
