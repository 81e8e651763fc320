"""Mosaic-compiled kernels vs their oracles, on the real chip.

Covers the four Pallas kernels (VERDICT round-2 Missing #4):
- flash attention forward AND blockwise backward (ops/attention.py) vs the
  dense SDPA + jax autodiff, across causal x padded x uneven-length grids;
- cin2d forward + backward (ops/cin_kernels.py) vs the einsum reference;
- factored_scatter_add / lookup backward (ops/embedding_kernels.py) vs
  XLA's scatter-add, with heavy id collisions;
- fm_interaction_pallas (ops/fm.py) vs the jnp formulation.

Tolerances: kernels that feed the MXU in bf16 with f32 accumulation
(cin2d, factored_scatter_add — documented in their module docstrings) get
bf16-rounding tolerances (~1e-2 relative of operand scale); f32 kernels
(flash attention, fm) get tight f32 tolerances.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_recommenders_tpu.ops.attention import (
    flash_attention_diff,
    scaled_dot_product_attention,
)
from deep_recommenders_tpu.ops.cin_kernels import _cin2d_reference, cin2d
from deep_recommenders_tpu.ops.embedding_kernels import (
    factored_scatter_add,
    lookup,
)
from deep_recommenders_tpu.ops.fm import fm_interaction, fm_interaction_pallas


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize(
    "sq,sk,padded",
    [
        (256, 256, False),
        (256, 256, True),
        (192, 320, True),  # uneven lengths, not block-multiples
        (128, 64, False),
    ],
)
def test_flash_attention_fwd_bwd_matches_sdpa(causal, sq, sk, padded):
    if causal and sq != sk:
        pytest.skip("causal defined for square attention here")
    rng = np.random.default_rng(hash((causal, sq, sk, padded)) % 2**31)
    bh, d = 4, 64
    q = jnp.asarray(rng.normal(0, 1, (bh, sq, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 1, (bh, sk, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 1, (bh, sk, d)).astype(np.float32))
    if padded:
        lengths = rng.integers(sk // 2, sk + 1, bh)
        key_mask = jnp.asarray(
            (np.arange(sk)[None, :] < lengths[:, None]).astype(np.float32)
        )
    else:
        key_mask = jnp.ones((bh, sk), jnp.float32)
    ct = jnp.asarray(rng.normal(0, 1, (bh, sq, d)).astype(np.float32))

    def flash_loss(q, k, v):
        return jnp.sum(flash_attention_diff(q, k, v, key_mask, causal) * ct)

    def ref_loss(q, k, v):
        return jnp.sum(
            scaled_dot_product_attention(
                q, k, v, key_mask=key_mask, causal=causal
            )
            * ct
        )

    # Both sides run their matmuls on the MXU (bf16 inputs, f32 accumulate)
    # but round differently (blockwise online softmax vs dense) — tolerances
    # are bf16-matmul-scale, not f32. A wrong mask/rescale/block seam shows
    # as O(1) error, far above these.
    out = flash_attention_diff(q, k, v, key_mask, causal)
    ref = scaled_dot_product_attention(q, k, v, key_mask=key_mask,
                                       causal=causal)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=5e-3, atol=5e-3
    )

    grads = jax.grad(flash_loss, argnums=(0, 1, 2))(q, k, v)
    ref_grads = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    for g, rg, name in zip(grads, ref_grads, "q k v".split()):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(rg), rtol=1e-2, atol=1e-2,
            err_msg=f"d{name} mismatch (causal={causal}, padded={padded})",
        )


def test_cin2d_fwd_bwd_matches_einsum():
    rng = np.random.default_rng(0)
    r, f0, h, m = 2048, 6, 64, 128
    x0v = jnp.asarray(rng.normal(0, 1, (r, f0)).astype(np.float32))
    xv = jnp.asarray(rng.normal(0, 1, (r, h)).astype(np.float32))
    w = jnp.asarray(rng.normal(0, 0.2, (f0, h, m)).astype(np.float32))
    ct = jnp.asarray(rng.normal(0, 1, (r, m)).astype(np.float32))

    out = cin2d(x0v, xv, w)
    ref = _cin2d_reference(x0v, xv, w)
    scale = float(np.abs(np.asarray(ref)).max())
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-2 * scale, rtol=2e-2
    )

    grads = jax.grad(lambda a, b, c: jnp.sum(cin2d(a, b, c) * ct),
                     argnums=(0, 1, 2))(x0v, xv, w)
    ref_grads = jax.grad(
        lambda a, b, c: jnp.sum(_cin2d_reference(a, b, c) * ct),
        argnums=(0, 1, 2),
    )(x0v, xv, w)
    for g, rg, name in zip(grads, ref_grads, ["dx0v", "dxv", "dw"]):
        s = float(np.abs(np.asarray(rg)).max())
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(rg), atol=2e-2 * s, rtol=2e-2,
            err_msg=f"{name} mismatch",
        )


@pytest.mark.parametrize("num_rows,n", [(1000, 16384), (7, 4096)])
def test_factored_scatter_add_matches_xla_scatter(num_rows, n):
    """Colliding ids (n >> num_rows) — the case where a wrong accumulation
    order or mask would show. bf16-input rounding tolerance per docstring."""
    rng = np.random.default_rng(1)
    c = 16
    g = jnp.asarray(rng.normal(0, 1, (n, c)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, num_rows, n).astype(np.int32))
    out = factored_scatter_add(g, ids, num_rows)
    # The documented semantics: g is rounded to bf16 before the MXU,
    # accumulation is f32 — so the oracle is an f32 scatter of bf16(g).
    # Against THAT, only f32 accumulation-order noise remains.
    g_bf16 = g.astype(jnp.bfloat16).astype(jnp.float32)
    ref = jnp.zeros((num_rows, c), jnp.float32).at[ids].add(g_bf16)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-3, rtol=1e-3
    )
    # And against the unrounded scatter, stay within worst-case bf16
    # rounding of the ~n/num_rows colliding N(0,1) terms per row (relative
    # error 2^-9 per term, tail magnitude ~4).
    exact = jnp.zeros((num_rows, c), jnp.float32).at[ids].add(g)
    bound = 4.0 * 2e-3 * max(n / num_rows, 1.0)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(exact), atol=bound, rtol=2e-2
    )


def test_lookup_backward_uses_factored_kernel_and_matches():
    rng = np.random.default_rng(2)
    v, c, n = 5000, 16, 8192
    table = jnp.asarray(rng.normal(0, 1, (v, c)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, v, n).astype(np.int32))
    ct = jnp.asarray(rng.normal(0, 1, (n, c)).astype(np.float32))

    np.testing.assert_array_equal(
        np.asarray(lookup(table, ids)), np.asarray(jnp.take(table, ids, 0))
    )
    dt = jax.grad(lambda t: jnp.sum(lookup(t, ids) * ct))(table)
    dt_ref = jax.grad(lambda t: jnp.sum(jnp.take(t, ids, 0) * ct))(table)
    np.testing.assert_allclose(
        np.asarray(dt), np.asarray(dt_ref), atol=2e-2, rtol=1e-2
    )


def test_fm_interaction_pallas_matches_jnp():
    rng = np.random.default_rng(3)
    b, f, d = 1024, 6, 16
    emb = jnp.asarray(rng.normal(0, 1, (b, f, d)).astype(np.float32))
    out = fm_interaction_pallas(emb)
    ref = fm_interaction(emb)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-4
    )


def test_cin_stack_pooled_fwd_bwd_on_chip():
    """Fused 2-layer CIN stack vs the fp32 einsum reference (round 5).

    Forward is tight. Gradients: the backward recomputes nothing but its
    relu masks come from bf16 activations, so isolated near-zero
    crossings flip vs an fp32 reference — any bf16 scheme has them and
    they are self-consistent with the kernel's own forward (the exact
    gradient OF the kernel is separately pinned by the interpret-mode
    test in tests/test_ops.py). Here: 99th-percentile error + global
    correlation against the fp32 autodiff.
    """
    from deep_recommenders_tpu.ops.cin_kernels import (
        _stack_reference,
        cin_stack_pooled,
    )

    rng = np.random.default_rng(0)
    for (b, f0, d, m1, m2) in [(512, 6, 16, 128, 128), (64, 5, 8, 64, 96)]:
        x0v = jnp.asarray(
            rng.normal(size=(b * d, f0)).astype(np.float32)
        ).astype(jnp.bfloat16)
        w1 = jnp.asarray(rng.normal(0, 0.2, (f0, f0, m1)).astype(np.float32))
        w2 = jnp.asarray(rng.normal(0, 0.2, (f0, m1, m2)).astype(np.float32))
        gp1 = jnp.asarray(rng.normal(size=(b, m1)).astype(np.float32))
        gp2 = jnp.asarray(rng.normal(size=(b, m2)).astype(np.float32))

        @jax.jit
        def both(x0v, w1, w2):
            def lk(a, bb, cc):
                p1, p2 = cin_stack_pooled(a, bb, cc, d)
                return jnp.sum(p1 * gp1) + jnp.sum(p2 * gp2)

            def lr(a, bb, cc):
                p1, p2 = _stack_reference(a, bb, cc, d)
                return jnp.sum(p1 * gp1) + jnp.sum(p2 * gp2)

            return (
                cin_stack_pooled(x0v, w1, w2, d),
                _stack_reference(x0v, w1, w2, d),
                jax.grad(lk, argnums=(0, 1, 2))(x0v, w1, w2),
                jax.grad(lr, argnums=(0, 1, 2))(x0v, w1, w2),
            )

        pk, pr, gk, gr = both(x0v, w1, w2)
        for name, a, r in [("p1", pk[0], pr[0]), ("p2", pk[1], pr[1])]:
            s = float(np.abs(np.asarray(r)).max())
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(r), atol=1e-2 * s, rtol=1e-2,
                err_msg=f"{name} (b={b})",
            )
        for name, a, r in [
            ("dx0", gk[0].astype(jnp.float32), gr[0].astype(jnp.float32)),
            ("dw1", gk[1], gr[1]),
            ("dw2", gk[2], gr[2]),
        ]:
            a, r = np.asarray(a), np.asarray(r)
            errs = np.abs(a - r) / (np.abs(r).max() + 1e-6)
            p99 = np.percentile(errs, 99)
            corr = np.corrcoef(a.ravel(), r.ravel())[0, 1]
            assert p99 < 2e-2 and corr > 0.995, (name, b, p99, corr)
