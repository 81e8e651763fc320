import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_recommenders_tpu.models.multitask import ESMM, MMoE


@pytest.mark.parametrize("batch_size", [4, 32])
def test_mmoe_shapes(batch_size, rng):
    """Shape-test idiom of ref tests/estimator/test_mixture_of_experts.py."""
    # num_tasks != num_experts works (the reference's gate bug made this
    # configuration crash; SURVEY §fidelity).
    model = MMoE(
        num_tasks=2, num_experts=5, expert_hidden=(16,), expert_dim=8,
        tower_hidden=(8,),
    )
    x = jnp.asarray(rng.normal(size=(batch_size, 12)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(params, x)
    assert len(outs) == 2
    for o in outs:
        assert o.shape == (batch_size, 1)


def test_mmoe_experts_are_batched(rng):
    model = MMoE(num_tasks=2, num_experts=3, expert_hidden=(8,), expert_dim=4)
    x = jnp.asarray(rng.normal(size=(4, 6)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    # Expert params carry a leading expert axis (one fused tensor, no loop).
    expert_params = params["params"]["experts"]
    leaf = jax.tree.leaves(expert_params)[0]
    assert leaf.shape[0] == 3


def test_esmm_probability_structure(rng):
    model = ESMM(cvr_hidden=(8,), ctr_hidden=(8,))
    x = jnp.asarray(rng.normal(size=(16, 10)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    p_cvr, p_ctr, p_ctcvr = model.apply(params, x)
    for p in (p_cvr, p_ctr, p_ctcvr):
        assert p.shape == (16, 1)
        assert (np.asarray(p) >= 0).all() and (np.asarray(p) <= 1).all()
    np.testing.assert_allclose(
        np.asarray(p_ctcvr), np.asarray(p_ctr * p_cvr), rtol=1e-6
    )


def test_mmoe_expert_parallel_matches_replicated(rng):
    """EP wiring (VERDICT round-2 #6): expert params sharded over the mesh
    "model" axis along the leading expert dim — loss and ALL gradients must
    match the replicated (no-mesh) run."""
    import optax
    from jax.sharding import PartitionSpec as P

    from deep_recommenders_tpu.models.multitask.mmoe import (
        shard_expert_params,
    )
    from deep_recommenders_tpu.parallel import (
        MeshConfig,
        create_mesh,
        shard_batch,
    )

    mesh = create_mesh(MeshConfig(data=2, model=4))
    x = rng.normal(size=(16, 12)).astype(np.float32)
    y0 = rng.normal(size=(16, 1)).astype(np.float32)
    y1 = rng.normal(size=(16, 1)).astype(np.float32)

    kwargs = dict(
        num_tasks=2, num_experts=4, expert_hidden=(8,), expert_dim=8,
        tower_hidden=(8,),
    )
    dense = MMoE(**kwargs)
    ep = MMoE(expert_parallel=True, **kwargs)
    params = dense.init(jax.random.PRNGKey(0), jnp.asarray(x))

    def loss_fn(model):
        def f(p, x, y0, y1):
            o0, o1 = model.apply(p, x)
            return jnp.mean((o0 - y0) ** 2) + jnp.mean((o1 - y1) ** 2)
        return f

    l_ref, g_ref = jax.value_and_grad(loss_fn(dense))(
        params, jnp.asarray(x), jnp.asarray(y0), jnp.asarray(y1)
    )

    ep_params = shard_expert_params(params, mesh)
    # Expert params really are sharded over "model" on the expert dim.
    kernel = ep_params["params"]["experts"]["Dense_0"]["kernel"]
    assert kernel.sharding.spec == P("model", None, None)
    xb = shard_batch({"x": x, "y0": y0, "y1": y1}, mesh)
    l_ep, g_ep = jax.jit(jax.value_and_grad(loss_fn(ep)))(
        ep_params, xb["x"], xb["y0"], xb["y1"]
    )
    np.testing.assert_allclose(float(l_ep), float(l_ref), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g_ep), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )
