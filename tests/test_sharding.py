"""Multi-device tests on the 8-device virtual CPU mesh (SURVEY §4 addition:
the reference has zero multi-device tests — these are new capability)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from deep_recommenders_tpu.datasets import MovielensRanking
from deep_recommenders_tpu.models.ranking import DeepFM
from deep_recommenders_tpu.parallel import (
    MeshConfig,
    batch_sharding,
    create_mesh,
    shard_batch,
    table_sharding,
)
from deep_recommenders_tpu.training import Trainer


def test_eight_virtual_devices():
    assert jax.device_count() == 8


def test_mesh_construction():
    mesh = create_mesh(MeshConfig(data=4, model=2))
    assert mesh.shape == {"data": 4, "model": 2}
    mesh = create_mesh(MeshConfig(data=-1, model=2))
    assert mesh.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        create_mesh(MeshConfig(data=3, model=2))


def test_data_parallel_train_step_matches_single_device():
    """DP over the mesh must be numerically identical to single-device."""
    ds = MovielensRanking(batch_size=64, num_ratings=2000, seed=3)
    specs = ds.feature_specs
    batch, labels = next(iter(ds.train_batches()))

    def run(mesh):
        model = DeepFM(specs, embedding_dim=8, hidden=(16,))
        trainer = Trainer(model, optax.sgd(0.1), mesh=mesh, seed=0)
        b = shard_batch(batch, mesh)
        l = shard_batch(labels, mesh)
        state = trainer.init(b)
        state, loss = trainer.train_step(state, b, l)
        return float(loss), jax.tree.map(np.asarray, state.params)

    loss_1, params_1 = run(None)
    mesh = create_mesh(MeshConfig(data=8, model=1))
    loss_8, params_8 = run(mesh)
    assert abs(loss_1 - loss_8) < 1e-4
    flat1 = jax.tree.leaves(params_1)
    flat8 = jax.tree.leaves(params_8)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_model_sharded_embedding_table():
    """Row-sharded embedding table over the model axis trains correctly."""
    ds = MovielensRanking(batch_size=64, num_ratings=2000, seed=3)
    specs = ds.feature_specs
    batch, labels = next(iter(ds.train_batches()))
    mesh = create_mesh(MeshConfig(data=2, model=4))
    model = DeepFM(specs, embedding_dim=8, hidden=(16,))
    trainer = Trainer(model, optax.sgd(0.1), mesh=mesh, seed=0)
    b = shard_batch(batch, mesh)
    l = shard_batch(labels, mesh)
    state = trainer.init(b)
    # Explicitly place the fused table row-sharded over "model".
    table = state.params["params"]["embeddings"]["table"]
    state.params["params"]["embeddings"]["table"] = jax.device_put(
        table, table_sharding(mesh)
    )
    state, loss = trainer.train_step(state, b, l)
    assert np.isfinite(float(loss))
    state, loss2 = trainer.train_step(state, b, l)
    assert float(loss2) < float(loss) + 1.0


def test_shard_batch_places_on_data_axis():
    mesh = create_mesh(MeshConfig(data=8, model=1))
    x = {"a": np.ones((16, 4), np.float32)}
    out = shard_batch(x, mesh)
    sh = out["a"].sharding
    assert isinstance(sh, NamedSharding)
    assert sh.spec == P("data", None) or sh.spec == P("data")
    assert batch_sharding(mesh, 2).spec == P("data", None)
