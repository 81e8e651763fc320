"""Meshed two-tower: sharded embeddings + trainable pod-wide negatives.

Round-3 bar (VERDICT #2): a TwoTower with ``mesh=`` routes both towers'
embedding lookups through the explicit shard_map exchange, and
``Retrieval(axis_name="data", mesh=mesh)`` computes the pod-wide-negatives
loss from inside a plain jitted train step. Loss AND grads must match the
single-device global-batch computation (ref sbcnm.py:120-151 semantics).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from deep_recommenders_tpu.features import Feature
from deep_recommenders_tpu.models.retrieval import Retrieval, TwoTower
from deep_recommenders_tpu.parallel import (
    MeshConfig,
    create_mesh,
    shard_batch,
    table_sharding,
)


@pytest.fixture(scope="module")
def mesh():
    return create_mesh(MeshConfig(data=2, model=4))


USER_SPECS = (
    Feature("user_id", hash_buckets=300),
    Feature("user_age", vocab=tuple(range(7))),
)
ITEM_SPECS = (
    Feature("movie_id", hash_buckets=400),
    Feature("movie_genres", vocab=tuple(range(18)), max_len=4),
)


def _batches(rng, b=16):
    qb = {
        "user_id": rng.integers(0, 300, b).astype(np.int32),
        "user_age": rng.integers(0, 7, b).astype(np.int32),
    }
    cb = {
        "movie_id": rng.integers(0, 400, b).astype(np.int32),
        "movie_genres": rng.integers(0, 18, (b, 4)).astype(np.int32),
        "movie_genres__wt": (rng.random((b, 4)) < 0.8).astype(np.float32),
    }
    return qb, cb


def _graft(dense_params, meshed_model, qb, cb):
    """Copy dense params into the mesh model's (vocab-padded) param tree."""
    sh_params = jax.tree.map(
        np.array, meshed_model.init(jax.random.PRNGKey(0), qb, cb)
    )
    d = jax.tree.map(np.asarray, dense_params)
    for tower in ("query_tower", "candidate_tower"):
        dt = d["params"][tower]["embeddings"]["table"]
        padded = sh_params["params"][tower]["embeddings"]["table"]
        padded[:] = 0.0
        padded[: dt.shape[0]] = dt
        sh_params["params"][tower]["projection"] = d["params"][tower][
            "projection"
        ]
    return jax.tree.map(jnp.asarray, sh_params)


def test_meshed_two_tower_step_matches_global(mesh, rng):
    qb_np, cb_np = _batches(rng)
    dense = TwoTower(USER_SPECS, ITEM_SPECS, embedding_dim=8, hidden=(16,),
                     output_dim=8)
    meshed = TwoTower(USER_SPECS, ITEM_SPECS, embedding_dim=8, hidden=(16,),
                      output_dim=8, mesh=mesh)
    params = dense.init(jax.random.PRNGKey(0), qb_np, cb_np)
    sh_params = _graft(params, meshed, qb_np, cb_np)

    task_global = Retrieval(temperature=0.2)
    task_pod = Retrieval(temperature=0.2, axis_name="data", mesh=mesh)

    def dense_loss(p):
        qe, ce = dense.apply(p, qb_np, cb_np)
        return task_global(qe, ce)

    qb = shard_batch(qb_np, mesh)
    cb = shard_batch(cb_np, mesh)

    @jax.jit
    def meshed_loss(p):
        qe, ce = meshed.apply(p, qb, cb)
        return task_pod(qe, ce)

    l_dense, g_dense = jax.value_and_grad(dense_loss)(params)
    l_mesh, g_mesh = jax.value_and_grad(meshed_loss)(sh_params)
    np.testing.assert_allclose(float(l_mesh), float(l_dense), rtol=1e-5)

    for tower in ("query_tower", "candidate_tower"):
        gt_d = np.asarray(g_dense["params"][tower]["embeddings"]["table"])
        gt_m = np.asarray(g_mesh["params"][tower]["embeddings"]["table"])
        v = gt_d.shape[0]
        np.testing.assert_allclose(gt_m[:v], gt_d, rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(gt_m[v:], 0.0, atol=1e-7)
        for leaf_m, leaf_d in zip(
            jax.tree.leaves(g_mesh["params"][tower]["projection"]),
            jax.tree.leaves(g_dense["params"][tower]["projection"]),
        ):
            np.testing.assert_allclose(
                np.asarray(leaf_m), np.asarray(leaf_d), rtol=1e-4, atol=1e-6
            )


def test_meshed_two_tower_pod_options_match_global(mesh, rng):
    """logQ correction + accidental-negative removal survive the pod path."""
    qb_np, cb_np = _batches(rng)
    b = 16
    probs = (rng.random(b).astype(np.float32) * 0.5 + 0.1)
    cand_ids = rng.integers(0, 50, b).astype(np.int32)  # collisions likely

    dense = TwoTower(USER_SPECS, ITEM_SPECS, embedding_dim=8, hidden=(16,),
                     output_dim=8)
    meshed = TwoTower(USER_SPECS, ITEM_SPECS, embedding_dim=8, hidden=(16,),
                      output_dim=8, mesh=mesh)
    params = dense.init(jax.random.PRNGKey(0), qb_np, cb_np)
    sh_params = _graft(params, meshed, qb_np, cb_np)

    kw = dict(temperature=0.5, remove_accidental_negatives=True)
    task_global = Retrieval(**kw)
    task_pod = Retrieval(**kw, axis_name="data", mesh=mesh)

    qe, ce = dense.apply(params, qb_np, cb_np)
    l_dense = task_global(
        qe, ce,
        candidate_sampling_probability=jnp.asarray(probs),
        candidate_ids=jnp.asarray(cand_ids),
    )
    qb = shard_batch(qb_np, mesh)
    cb = shard_batch(cb_np, mesh)
    probs_g = shard_batch(probs, mesh)
    ids_g = shard_batch(cand_ids, mesh)

    @jax.jit
    def pod_loss(p):
        qe, ce = meshed.apply(p, qb, cb)
        return task_pod(
            qe, ce,
            candidate_sampling_probability=probs_g,
            candidate_ids=ids_g,
        )

    np.testing.assert_allclose(
        float(pod_loss(sh_params)), float(l_dense), rtol=1e-5
    )


def test_meshed_two_tower_trains(mesh, rng):
    """Full jitted train steps: table row-sharded, loss decreases."""
    qb_np, cb_np = _batches(rng, b=32)
    model = TwoTower(USER_SPECS, ITEM_SPECS, embedding_dim=8, hidden=(16,),
                     output_dim=8, mesh=mesh)
    task = Retrieval(temperature=0.2, axis_name="data", mesh=mesh)
    opt = optax.adagrad(0.1)

    qb = shard_batch(qb_np, mesh)
    cb = shard_batch(cb_np, mesh)
    params = model.init(jax.random.PRNGKey(0), qb, cb)
    # Row-shard both towers' fused tables over "model".
    for tower in ("query_tower", "candidate_tower"):
        tbl = params["params"][tower]["embeddings"]["table"]
        params["params"][tower]["embeddings"]["table"] = jax.device_put(
            tbl, table_sharding(mesh)
        )
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            qe, ce = model.apply(p, qb, cb)
            return task(qe, ce)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(5):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()
