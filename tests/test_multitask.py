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
