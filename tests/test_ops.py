import jax
import jax.numpy as jnp
import numpy as np

from deep_recommenders_tpu.ops import (
    cin_interaction,
    dice,
    fm_interaction,
    fm_interaction_pallas,
)


def test_fm_interaction_matches_numpy(rng):
    """Golden-value idiom (SURVEY §4.2): kernel vs closed-form numpy."""
    emb = rng.normal(size=(8, 5, 12)).astype(np.float32)
    got = np.asarray(fm_interaction(jnp.asarray(emb)))
    sum_v = emb.sum(1)
    expected = 0.5 * (
        (sum_v**2).sum(-1) - (emb**2).sum((1, 2))
    )
    np.testing.assert_allclose(got[:, 0], expected, rtol=1e-4, atol=1e-5)


def test_fm_interaction_pairwise_equivalence(rng):
    """FM trick == explicit sum over pairs <v_i, v_j>."""
    emb = rng.normal(size=(4, 6, 8)).astype(np.float32)
    got = np.asarray(fm_interaction(jnp.asarray(emb)))[:, 0]
    expected = np.zeros(4)
    for i in range(6):
        for j in range(i + 1, 6):
            expected += (emb[:, i] * emb[:, j]).sum(-1)
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_fm_pallas_fallback_matches(rng):
    emb = jnp.asarray(rng.normal(size=(16, 4, 8)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(fm_interaction_pallas(emb)),
        np.asarray(fm_interaction(emb)),
        rtol=1e-5,
    )


def test_cin_matches_naive_outer_product(rng):
    """CIN einsum == the reference's split/outer/conv1d formulation."""
    b, f0, f, d, m = 3, 4, 5, 6, 7
    x0 = rng.normal(size=(b, f0, d)).astype(np.float32)
    x = rng.normal(size=(b, f, d)).astype(np.float32)
    w = rng.normal(size=(f0, f, m)).astype(np.float32)
    got = np.asarray(cin_interaction(jnp.asarray(x0), jnp.asarray(x), jnp.asarray(w)))
    # Naive: out[b,m,d] = sum_{i,j} x0[b,i,d] x[b,j,d] w[i,j,m]
    expected = np.einsum("bid,bjd,ijm->bmd", x0, x, w)
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_dice_properties(rng):
    x = jnp.asarray(rng.normal(size=(32, 8)).astype(np.float32))
    alpha = jnp.zeros((8,))
    out = dice(x, alpha)
    assert out.shape == x.shape
    # With alpha=0, negative inputs map to 0 (PReLU zeroes them).
    np.testing.assert_allclose(
        np.asarray(out)[np.asarray(x) <= 0], 0.0, atol=1e-6
    )
    # Closed form for alpha=0: out = p * relu(x), p = sigmoid(standardized x).
    xn = np.asarray(x)
    mean = xn.mean(1, keepdims=True)
    var = xn.var(1, keepdims=True)
    p = 1.0 / (1.0 + np.exp(-(xn - mean) / np.sqrt(var + 1e-8)))
    expected = np.where(xn > 0, p * xn, 0.0)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-6)


def test_dice_grads_finite(rng):
    x = jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32))
    alpha = jnp.full((4,), 0.25)
    g = jax.grad(lambda x: dice(x, alpha).sum())(x)
    assert np.isfinite(np.asarray(g)).all()


# --- MXU-factored embedding gradient kernel --------------------------------

def test_factored_scatter_add_matches_xla(rng):
    """factored_scatter_add == zeros.at[ids].add(g) (CPU falls back to XLA;
    on TPU the kernel path runs with bf16 input rounding)."""
    from deep_recommenders_tpu.ops.embedding_kernels import (
        factored_scatter_add,
    )

    n, v, c = 1000, 515, 16
    ids = jnp.asarray(rng.integers(0, v, n).astype(np.int32))
    g = jnp.asarray(rng.normal(0, 1, (n, c)).astype(np.float32))
    got = factored_scatter_add(g, ids, v)
    want = jnp.zeros((v, c), jnp.float32).at[ids].add(g)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-2, atol=1e-2
    )


def test_lookup_forward_and_grad(rng):
    """lookup == take, and its VJP sums colliding rows like scatter-add."""
    from deep_recommenders_tpu.ops.embedding_kernels import lookup

    v, c, b = 300, 8, 64
    table = jnp.asarray(rng.normal(0, 1, (v, c)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, v, (b, 3)).astype(np.int32))
    np.testing.assert_array_equal(
        np.asarray(lookup(table, ids)),
        np.asarray(jnp.take(table, ids, axis=0)),
    )

    def loss(t):
        return (lookup(t, ids) ** 2).sum()

    def loss_ref(t):
        return (jnp.take(t, ids, axis=0) ** 2).sum()

    g = jax.grad(loss)(table)
    g_ref = jax.grad(loss_ref)(table)
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(g_ref), rtol=2e-2, atol=1e-2
    )
