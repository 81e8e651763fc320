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


def test_cin_stack_pooled_reference_matches_layered_math(rng):
    """_stack_reference == two cin_interaction layers + relu + d-sum."""
    from deep_recommenders_tpu.ops.cin_kernels import _stack_reference

    b, f0, d, m1, m2 = 16, 6, 8, 12, 20
    x0 = jnp.asarray(rng.normal(size=(b, f0, d)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(0, 0.2, (f0, f0, m1)).astype(np.float32))
    w2 = jnp.asarray(rng.normal(0, 0.2, (f0, m1, m2)).astype(np.float32))
    z1 = jax.nn.relu(cin_interaction(x0, x0, w1))  # (B, M1, D)
    z2 = jax.nn.relu(cin_interaction(x0, z1, w2))
    x0v = x0.transpose(0, 2, 1).reshape(b * d, f0)
    p1, p2 = _stack_reference(x0v, w1, w2, d)
    np.testing.assert_allclose(
        np.asarray(p1), np.asarray(z1.sum(axis=2)), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(p2), np.asarray(z2.sum(axis=2)), rtol=1e-4, atol=1e-4
    )


def test_cin_stack_kernel_grad_is_exact_in_interpret_mode(rng):
    """The Pallas backward IS the gradient of the Pallas forward.

    Comparing against an fp32 reference mixes in relu-mask flips at bf16
    zero crossings; the decisive check is against autodiff of a jnp clone
    with the kernel's exact cast structure — run in interpret mode so the
    kernel bodies execute off-TPU (the chip oracle lives in tests/tpu).
    """
    import deep_recommenders_tpu.ops.cin_kernels as ck

    bf = jnp.bfloat16
    b, f0, d, m1, m2 = 32, 6, 16, 128, 128

    def clone(x0v, w1, w2):
        w1v = w1.reshape(f0 * f0, m1)
        xb = x0v.astype(bf)
        y = jnp.concatenate(
            [xb[:, f : f + 1] * xb for f in range(f0)], axis=1
        )
        z1pre = jax.lax.dot_general(
            y, w1v.astype(bf), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        z1 = jnp.maximum(z1pre, 0.0)
        p1 = z1.reshape(-1, d, m1).sum(axis=1)
        z1b = z1.astype(bf)
        acc = jnp.zeros((x0v.shape[0], m2), jnp.float32)
        for f in range(f0):
            acc += jax.lax.dot_general(
                xb[:, f : f + 1] * z1b, w2[f].astype(bf),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        z2 = jnp.maximum(acc, 0.0)
        return p1, z2.reshape(-1, d, m2).sum(axis=1)

    x0v = jnp.asarray(
        rng.normal(size=(b * d, f0)).astype(np.float32)
    ).astype(bf)
    w1 = jnp.asarray(rng.normal(0, 0.2, (f0, f0, m1)).astype(np.float32))
    w2 = jnp.asarray(rng.normal(0, 0.2, (f0, m1, m2)).astype(np.float32))
    gp1 = jnp.asarray(rng.normal(size=(b, m1)).astype(np.float32))
    gp2 = jnp.asarray(rng.normal(size=(b, m2)).astype(np.float32))

    def loss(fn):
        def inner(a, bb, cc):
            p1, p2 = fn(a, bb, cc)
            return jnp.sum(p1 * gp1) + jnp.sum(p2 * gp2)
        return inner

    old = ck.STACK_INTERPRET
    ck.STACK_INTERPRET = True
    try:
        gk = jax.grad(
            loss(lambda a, bb, cc: ck.cin_stack_pooled(a, bb, cc, d)),
            argnums=(0, 1, 2),
        )(x0v, w1, w2)
    finally:
        ck.STACK_INTERPRET = old
    gc = jax.grad(loss(clone), argnums=(0, 1, 2))(x0v, w1, w2)
    for name, a, r in zip(
        ("dx0", "dw1", "dw2"),
        (gk[0].astype(jnp.float32), gk[1], gk[2]),
        (gc[0].astype(jnp.float32), gc[1], gc[2]),
    ):
        a, r = np.asarray(a), np.asarray(r)
        err = np.abs(a - r).max() / (np.abs(r).max() + 1e-6)
        assert err < 2e-2, (name, err)


def test_dice_reference_normalization_mode(rng):
    """normalization="reference" reproduces the ref's sqrt(reduce_std)
    denominator (ref din.py:110-121 computes reduce_std but names it var);
    the default stays the DIN paper's sqrt(variance)."""
    x = rng.normal(size=(16, 8)).astype(np.float32)
    alpha = np.full((8,), 0.25, np.float32)
    mean = x.mean(axis=1, keepdims=True)
    var = x.var(axis=1, keepdims=True)
    for mode, denom in (
        ("paper", np.sqrt(var + 1e-8)),
        ("reference", np.sqrt(np.sqrt(var) + 1e-8)),
    ):
        p = 1.0 / (1.0 + np.exp(-(x - mean) / denom))
        prelu = np.where(x > 0, x, alpha * x)
        want = np.where(prelu > 0, p * prelu, (1 - p) * prelu)
        got = np.asarray(
            dice(jnp.asarray(x), jnp.asarray(alpha), normalization=mode)
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    import pytest

    with pytest.raises(ValueError):
        dice(jnp.asarray(x), jnp.asarray(alpha), normalization="bogus")
