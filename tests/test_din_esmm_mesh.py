"""Meshed DIN and ESMM: the last two zoo models get the mesh= field.

Round-4 bar (VERDICT r3 Next #6): DIN (ids-in mode, owned item table) and
ESMM (specs front end, shared EmbeddingCollection) route their table
lookups through the explicit row-sharded shard_map exchange, and the meshed
loss AND grads match the single-device computation — same template as
tests/test_two_tower_mesh.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_recommenders_tpu.features import Feature
from deep_recommenders_tpu.models.multitask import ESMM
from deep_recommenders_tpu.models.ranking import DIN
from deep_recommenders_tpu.parallel import (
    MeshConfig,
    create_mesh,
    shard_batch,
)


@pytest.fixture(scope="module")
def mesh():
    return create_mesh(MeshConfig(data=2, model=4))


def test_meshed_din_loss_and_grads_match(mesh, rng):
    b, t, n_items = 16, 8, 300
    behaviors = rng.integers(0, n_items, (b, t)).astype(np.int32)
    mask = (rng.random((b, t)) < 0.8).astype(np.float32)
    candidate = rng.integers(0, n_items, b).astype(np.int32)
    labels = (rng.random((b, 1)) < 0.5).astype(np.float32)

    dense = DIN(attention_units=8, hidden=(16,), num_items=n_items,
                embedding_dim=8)
    meshed = DIN(attention_units=8, hidden=(16,), num_items=n_items,
                 embedding_dim=8, mesh=mesh)
    params = dense.init(
        jax.random.PRNGKey(0), behaviors, mask, candidate
    )
    # Graft dense params into the mesh model's (vocab-padded) tree.
    sh_params = jax.tree.map(
        np.array, meshed.init(jax.random.PRNGKey(0), behaviors, mask,
                              candidate)
    )
    d = jax.tree.map(np.asarray, params)
    padded = sh_params["params"]["item_table"]
    padded[:] = 0.0
    dt = d["params"]["item_table"]
    padded[: dt.shape[0]] = dt
    for k in sh_params["params"]:
        if k != "item_table":
            sh_params["params"][k] = d["params"][k]
    sh_params = jax.tree.map(jnp.asarray, sh_params)

    import optax

    def dense_loss(p):
        logits = dense.apply(p, behaviors, mask, candidate)
        return optax.sigmoid_binary_cross_entropy(logits, labels).mean()

    bh = shard_batch(behaviors, mesh)
    mk = shard_batch(mask, mesh)
    cd = shard_batch(candidate, mesh)
    lb = shard_batch(labels, mesh)

    @jax.jit
    def meshed_loss(p):
        logits = meshed.apply(p, bh, mk, cd)
        return optax.sigmoid_binary_cross_entropy(logits, lb).mean()

    l_dense, g_dense = jax.value_and_grad(dense_loss)(params)
    l_mesh, g_mesh = jax.value_and_grad(meshed_loss)(sh_params)
    np.testing.assert_allclose(float(l_mesh), float(l_dense), rtol=1e-5)

    gt_d = np.asarray(g_dense["params"]["item_table"])
    gt_m = np.asarray(g_mesh["params"]["item_table"])
    v = gt_d.shape[0]
    np.testing.assert_allclose(gt_m[:v], gt_d, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(gt_m[v:], 0.0, atol=1e-7)


def test_din_mesh_requires_num_items(mesh, rng):
    model = DIN(mesh=mesh)
    behaviors = jnp.asarray(rng.normal(0, 1, (4, 3, 8)).astype(np.float32))
    mask = jnp.ones((4, 3), jnp.float32)
    cand = jnp.asarray(rng.normal(0, 1, (4, 8)).astype(np.float32))
    with pytest.raises(ValueError, match="requires num_items"):
        model.init(jax.random.PRNGKey(0), behaviors, mask, cand)


SPECS = (
    Feature("user_id", hash_buckets=300),
    Feature("item_id", hash_buckets=400),
    Feature("tags", vocab=tuple(range(18)), max_len=4),
)


def _batch(rng, b=16):
    return {
        "user_id": rng.integers(0, 300, b).astype(np.int32),
        "item_id": rng.integers(0, 400, b).astype(np.int32),
        "tags": rng.integers(0, 18, (b, 4)).astype(np.int32),
        "tags__wt": (rng.random((b, 4)) < 0.8).astype(np.float32),
    }


def test_meshed_esmm_loss_and_grads_match(mesh, rng):
    batch_np = _batch(rng)
    b = 16
    y_click = (rng.random((b, 1)) < 0.5).astype(np.float32)
    y_conv = (y_click * (rng.random((b, 1)) < 0.3)).astype(np.float32)

    dense = ESMM(cvr_hidden=(16,), ctr_hidden=(16,), specs=SPECS,
                 embedding_dim=8)
    meshed = ESMM(cvr_hidden=(16,), ctr_hidden=(16,), specs=SPECS,
                  embedding_dim=8, mesh=mesh)
    params = dense.init(jax.random.PRNGKey(0), batch_np)
    sh_params = jax.tree.map(
        np.array, meshed.init(jax.random.PRNGKey(0), batch_np)
    )
    d = jax.tree.map(np.asarray, params)
    padded = sh_params["params"]["embeddings"]["table"]
    padded[:] = 0.0
    dt = d["params"]["embeddings"]["table"]
    padded[: dt.shape[0]] = dt
    for k in sh_params["params"]:
        if k != "embeddings":
            sh_params["params"][k] = d["params"][k]
    sh_params = jax.tree.map(jnp.asarray, sh_params)

    def esmm_loss(model, p, batch, yc, yv):
        p_cvr, p_ctr, p_ctcvr = model.apply(p, batch)
        eps = 1e-7
        ctr = -(yc * jnp.log(p_ctr + eps)
                + (1 - yc) * jnp.log(1 - p_ctr + eps)).mean()
        ctcvr = -(yv * jnp.log(p_ctcvr + eps)
                  + (1 - yv) * jnp.log(1 - p_ctcvr + eps)).mean()
        return ctr + ctcvr

    batch_g = shard_batch(batch_np, mesh)
    yc_g = shard_batch(y_click, mesh)
    yv_g = shard_batch(y_conv, mesh)

    l_dense, g_dense = jax.value_and_grad(
        lambda p: esmm_loss(dense, p, batch_np, y_click, y_conv)
    )(params)
    l_mesh, g_mesh = jax.value_and_grad(
        jax.jit(lambda p: esmm_loss(meshed, p, batch_g, yc_g, yv_g))
    )(sh_params)
    np.testing.assert_allclose(float(l_mesh), float(l_dense), rtol=1e-5)

    gt_d = np.asarray(g_dense["params"]["embeddings"]["table"])
    gt_m = np.asarray(g_mesh["params"]["embeddings"]["table"])
    v = gt_d.shape[0]
    np.testing.assert_allclose(gt_m[:v], gt_d, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(gt_m[v:], 0.0, atol=1e-7)


def test_esmm_mesh_requires_specs(mesh, rng):
    model = ESMM(mesh=mesh)
    x = jnp.asarray(rng.normal(0, 1, (4, 8)).astype(np.float32))
    with pytest.raises(ValueError, match="requires specs"):
        model.init(jax.random.PRNGKey(0), x)
