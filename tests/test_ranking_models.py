import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_recommenders_tpu.features import Feature, CrossedFeature
from deep_recommenders_tpu.models.ranking import (
    CIN,
    DCN,
    DIN,
    ActivationUnit,
    Cross,
    DeepFM,
    Dice,
    FactorizationMachine,
    FMLayer,
    FNN,
    WideDeep,
    XDeepFM,
    subtract_interacter,
)

SPECS = (
    Feature("user_id", hash_buckets=50),
    Feature("movie_id", hash_buckets=40),
    Feature("genres", vocab=("a", "b", "c"), max_len=3),
)


def make_batch(b=8, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "user_id": rng.integers(0, 50, b).astype(np.int32),
        "movie_id": rng.integers(0, 40, b).astype(np.int32),
        "genres": rng.integers(0, 4, (b, 3)).astype(np.int32),
        "genres__wt": (rng.random((b, 3)) < 0.7).astype(np.float32),
    }


@pytest.mark.parametrize("batch_size", [4, 16])
@pytest.mark.parametrize(
    "model_fn",
    [
        lambda: FactorizationMachine(SPECS, embedding_dim=8),
        lambda: DeepFM(SPECS, embedding_dim=8, hidden=(16, 8)),
        lambda: FNN(SPECS, embedding_dim=8, hidden=(16,)),
        lambda: DCN(SPECS, embedding_dim=8, num_cross_layers=2, hidden=(16,)),
        lambda: XDeepFM(
            SPECS, embedding_dim=8, cin_feature_maps=(6, 6), hidden=(16,)
        ),
    ],
)
def test_ranking_model_shapes(model_fn, batch_size):
    """Shape-test idiom parameterized over batch size (SURVEY §4.1)."""
    model = model_fn()
    batch = make_batch(batch_size)
    params = model.init(jax.random.PRNGKey(0), batch)
    out = model.apply(params, batch)
    assert out.shape == (batch_size, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_wide_deep_shapes():
    wide_specs = SPECS + (
        CrossedFeature("uxm", keys=("user_id", "movie_id"), hash_buckets=64),
    )
    model = WideDeep(
        deep_specs=SPECS, wide_specs=wide_specs, embedding_dim=8, hidden=(16,)
    )
    batch = make_batch(8)
    batch["uxm"] = np.arange(8, dtype=np.int32)
    params = model.init(jax.random.PRNGKey(0), batch)
    out = model.apply(params, batch)
    assert out.shape == (8, 1)
    # Params split into wide/deep scopes for per-scope optimizers
    # (wide_linear rides the fused table pass, wide_extra = crosses).
    assert any(k.startswith("wide") for k in params["params"])


def test_fm_layer_linear_only_degradation(rng):
    """Ref keras fm.py:25-26: no embeddings -> pure linear model."""
    layer = FMLayer()
    sparse = jnp.asarray(rng.random((4, 10)).astype(np.float32))
    params = layer.init(jax.random.PRNGKey(0), sparse)
    out = layer.apply(params, sparse)
    # Zero-init kernel => linear-only output is the bias (zero).
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)
    emb = jnp.asarray(rng.normal(size=(4, 3, 5)).astype(np.float32))
    out2 = layer.apply(params, sparse, emb)
    assert out2.shape == (4, 1)


def test_cross_golden_with_ones(rng):
    """Golden-value idiom: ones kernel, zero bias -> closed form."""
    x0 = jnp.asarray([[0.1, 0.2, 0.3]], dtype=jnp.float32)
    layer = Cross()
    params = layer.init(jax.random.PRNGKey(0), x0)
    params = jax.tree.map(jnp.ones_like, params)
    out = layer.apply(params, x0)
    # proj = x @ ones(3,3) + 1 = 0.6 + 1 = 1.6 ; out = x0 * 1.6 + x0
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(x0) * 2.6, rtol=1e-5
    )


def test_cross_low_rank_and_errors():
    x0 = jnp.ones((2, 8))
    layer = Cross(projection_dim=2)
    params = layer.init(jax.random.PRNGKey(0), x0)
    assert layer.apply(params, x0).shape == (2, 8)
    with pytest.raises(ValueError):
        Cross(projection_dim=5).init(jax.random.PRNGKey(0), x0)
    with pytest.raises(ValueError):
        Cross(diag_scale=-1.0)
    with pytest.raises(ValueError):
        layer.apply(params, x0, jnp.ones((2, 4)))


def test_cin_error_contracts():
    """Ref xdeepfm.py:41-48, :75-80 error contracts."""
    layer = CIN(feature_map=4)
    x0 = jnp.ones((2, 3, 5))
    with pytest.raises(ValueError):
        layer.init(jax.random.PRNGKey(0), x0)  # not a tuple
    with pytest.raises(ValueError):
        layer.init(jax.random.PRNGKey(0), (x0, x0, x0))  # wrong arity
    with pytest.raises(ValueError):
        layer.init(jax.random.PRNGKey(0), (x0, jnp.ones((2, 5))))  # not 3-D
    params = layer.init(jax.random.PRNGKey(0), (x0, x0))
    out = layer.apply(params, (x0, x0))
    assert out.shape == (2, 4, 5)


def test_activation_unit_matches_hand_built(rng):
    """Ref test idiom (test_din.py:17-48): AU == Dense over concat inputs."""
    x = jnp.asarray(rng.normal(size=(6, 8)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(6, 8)).astype(np.float32))
    au = ActivationUnit(units=4, interacter=subtract_interacter)
    params = au.init(jax.random.PRNGKey(0), x, y)
    out = au.apply(params, x, y)
    # Hand-build: same params applied to the explicit concat.
    concat = jnp.concatenate([x, y, x - y], axis=-1)
    p = params["params"]
    hidden = jax.nn.relu(
        concat @ p["dense_kernel"] + p["dense_kernel_bias"]
    )
    expected = hidden @ p["dense_output"] + p["dense_output_bias"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=1e-5)


def test_din_model_attention_pools_behaviors(rng):
    b, t, d = 4, 6, 8
    model = DIN(attention_units=8, hidden=(16,))
    behaviors = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))
    mask = jnp.asarray((rng.random((b, t)) < 0.8).astype(np.float32))
    candidate = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), behaviors, mask, candidate)
    out = model.apply(params, behaviors, mask, candidate)
    assert out.shape == (b, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_dice_layer(rng):
    x = jnp.asarray(rng.normal(size=(16, 4)).astype(np.float32))
    layer = Dice()
    params = layer.init(jax.random.PRNGKey(0), x)
    out = layer.apply(params, x)
    assert out.shape == x.shape


def test_activation_unit_fused_sequence_path_matches_concat(rng):
    """(B,T,D)x(B,D) fused scoring == the reference concat formulation
    applied pairwise (same params): concat([x,y,x-y]) @ W identity."""
    from deep_recommenders_tpu.models.ranking import (
        ActivationUnit,
        subtract_interacter,
    )

    b, t, d = 4, 5, 8
    unit = ActivationUnit(units=6, interacter=subtract_interacter)
    xs = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))
    params = unit.init(jax.random.PRNGKey(0), xs, y)
    fused = unit.apply(params, xs, y)  # (B, T, 1)
    tiled = jnp.broadcast_to(y[:, None, :], (b, t, d))
    pairwise = unit.apply(
        params, xs.reshape(b * t, d), tiled.reshape(b * t, d)
    ).reshape(b, t, 1)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(pairwise), rtol=1e-5, atol=1e-6
    )
