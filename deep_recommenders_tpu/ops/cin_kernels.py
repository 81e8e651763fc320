"""Pallas CIN kernel: outer-product + compression fused on the MXU.

One CIN layer (ops/cin.py) is out[b,m,d] = sum_{f,g} x0[b,f,d] x[b,g,d]
W[f,g,m]. Two things make the straightforward einsum slow on TPU:

1. Any contraction order materializes a huge intermediate in HBM — e.g.
   (B, F0, M, D) is 400 MB at the reference config (B=8192, M=128, D=16).
2. CIN tensors are (B, *, D) with D=16: XLA pads the minor dim to 128 lanes,
   an 8x physical blow-up on every load/store.

This kernel fixes both. Flatten rows r=(b,d) so every tensor is 2-D with a
HARDWARE-SIZED lane dim (H or M = feature maps, typically 128):

    out_v[r, m] = sum_f ( x0v[r, f] * xv[r, :] ) @ W[f]        (per f-slice)

Per row-tile, the f-slices of the outer product live only in VMEM/registers
— F0 (~6) small broadcast-multiplies each feeding a (RT, H) @ (H, M) MXU
matmul. The backward reuses T1_f = g @ W[f]^T for both dx (accumulate
x0[:, f] * T1_f) and dx0 (row-reduce xv * T1_f), and accumulates dW in a
VMEM-resident output block across the grid.

Measured (v5e, B=8192, F0=6, D=16, maps 128/128, full xDeepFM train step):
5.30 ms -> 1.66 ms per step vs the XLA einsum formulation.

Pure-JAX fallback off-TPU. bf16 MXU inputs / f32 accumulation, like
ops/embedding_kernels.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

ROW_TILE = 2048
# The backward keeps ~F0 unrolled iterations of (RT, H) temporaries live
# (t1, scaled, plus bf16 casts) on the Mosaic stack; at RT=2048/H=M=128 that
# overflows the 16M scoped-VMEM limit (measured 26.6M). Half the tile keeps
# every matmul MXU-shaped (1024x128 @ 128x128) well under the limit.
BWD_ROW_TILE = 1024


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


def _cin2d_reference(x0v, xv, w):
    # out[r, m] = sum_{f,g} x0v[r,f] xv[r,g] w[f,g,m]
    t = jnp.einsum("rg,fgm->rfm", xv, w)
    return jnp.einsum("rf,rfm->rm", x0v, t)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def cin2d(x0v: jax.Array, xv: jax.Array, w: jax.Array) -> jax.Array:
    """Fused CIN layer over flattened rows.

    x0v: (R, F0) f32; xv: (R, H) f32; w: (F0, H, M) f32 -> (R, M) f32.
    R must be a multiple of 8 (callers flatten (B, D) rows).
    """
    return _cin2d_fwd_impl(x0v, xv, w)


def _pad_rows(a, rt):
    r = a.shape[0]
    rp = -(-r // rt) * rt
    if rp != r:
        a = jnp.pad(a, ((0, rp - r),) + ((0, 0),) * (a.ndim - 1))
    return a


def _cin2d_fwd_impl(x0v, xv, w):
    if not _on_tpu():
        return _cin2d_reference(x0v, xv, w)

    from jax.experimental import pallas as pl

    r, f0 = x0v.shape
    h = xv.shape[1]
    m = w.shape[2]
    rt = min(ROW_TILE, -(-r // 8) * 8)
    x0p, xp = _pad_rows(x0v, rt), _pad_rows(xv, rt)
    rp = x0p.shape[0]

    def kernel(x0_ref, x_ref, w_ref, o_ref):
        x = x_ref[:].astype(jnp.bfloat16)  # (RT, H)
        acc = jnp.zeros((x.shape[0], m), jnp.float32)
        for f in range(f0):
            scaled = x0_ref[:, f : f + 1].astype(jnp.bfloat16) * x
            acc += jax.lax.dot_general(
                scaled,
                w_ref[f].astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        o_ref[:] = acc

    out = pl.pallas_call(
        kernel,
        grid=(rp // rt,),
        in_specs=[
            pl.BlockSpec((rt, f0), lambda i: (i, 0)),
            pl.BlockSpec((rt, h), lambda i: (i, 0)),
            pl.BlockSpec((f0, h, m), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((rt, m), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rp, m), jnp.float32),
    )(x0p, xp, w)
    return out[:r]


def _cin2d_fwd(x0v, xv, w):
    return _cin2d_fwd_impl(x0v, xv, w), (x0v, xv, w)


def _cin2d_bwd(res, g):
    x0v, xv, w = res
    if not _on_tpu():
        t = jnp.einsum("rg,fgm->rfm", xv, w)
        dx0 = jnp.einsum("rm,rfm->rf", g, t)
        zu = jnp.einsum("rf,rm->rfm", x0v, g)
        dx = jnp.einsum("rfm,fgm->rg", zu, w)
        dw = jnp.einsum("rf,rg,rm->fgm", x0v, xv, g)
        return dx0, dx, dw

    from jax.experimental import pallas as pl

    r, f0 = x0v.shape
    h = xv.shape[1]
    m = w.shape[2]
    rt = min(BWD_ROW_TILE, -(-r // 8) * 8)
    x0p, xp = _pad_rows(x0v, rt), _pad_rows(xv, rt)
    gp = _pad_rows(g, rt)  # padded g rows are zero -> no dW pollution
    rp = x0p.shape[0]

    def kernel(x0_ref, x_ref, w_ref, g_ref, dx0_ref, dx_ref, dw_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            dw_ref[:] = jnp.zeros_like(dw_ref)

        x = x_ref[:].astype(jnp.bfloat16)  # (RT, H)
        gg = g_ref[:].astype(jnp.bfloat16)  # (RT, M)
        dx = jnp.zeros((x.shape[0], h), jnp.float32)
        dx0_cols = []
        for f in range(f0):
            wf = w_ref[f].astype(jnp.bfloat16)  # (H, M)
            # Contract over M/rows via dimension_numbers — NO explicit .T:
            # a materialized transpose costs a Mosaic relayout of a
            # (RT, 128) block per f-slice, which made this backward slower
            # than XLA's einsum (measured 1.8ms vs 1.06ms at RT=1024).
            t1 = jax.lax.dot_general(  # (RT, H) = g @ W_f^T
                gg, wf, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            x0f = x0_ref[:, f : f + 1]  # (RT, 1) f32
            dx += x0f * t1
            dx0_cols.append(
                jnp.sum(x_ref[:] * t1, axis=1, keepdims=True)
            )  # (RT, 1)
            scaled = (x0f.astype(jnp.bfloat16) * x)  # (RT, H)
            dw_ref[f] += jax.lax.dot_general(  # (H, M) = scaled^T @ g
                scaled, gg, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        dx_ref[:] = dx
        dx0_ref[:] = jnp.concatenate(dx0_cols, axis=1)

    dx0, dx, dw = pl.pallas_call(
        kernel,
        grid=(rp // rt,),
        in_specs=[
            pl.BlockSpec((rt, f0), lambda i: (i, 0)),
            pl.BlockSpec((rt, h), lambda i: (i, 0)),
            pl.BlockSpec((f0, h, m), lambda i: (0, 0, 0)),
            pl.BlockSpec((rt, m), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((rt, f0), lambda i: (i, 0)),
            pl.BlockSpec((rt, h), lambda i: (i, 0)),
            pl.BlockSpec((f0, h, m), lambda i: (0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rp, f0), jnp.float32),
            jax.ShapeDtypeStruct((rp, h), jnp.float32),
            jax.ShapeDtypeStruct((f0, h, m), jnp.float32),
        ],
    )(x0p, xp, w, gp)
    return dx0[:r], dx[:r], dw


cin2d.defvjp(_cin2d_fwd, _cin2d_bwd)


def cin_interaction_fused(
    x0: jax.Array, x: jax.Array, kernel: jax.Array
) -> jax.Array:
    """Drop-in for ops/cin.cin_interaction using the fused 2-D kernel.

    x0: (B, F0, D); x: (B, F, D); kernel: (F0, F, M) -> (B, M, D).
    """
    b, f0, d = x0.shape
    h = x.shape[1]
    x0v = x0.transpose(0, 2, 1).reshape(b * d, f0)
    xv = x.transpose(0, 2, 1).reshape(b * d, h)
    out = cin2d(x0v, xv, kernel)  # (B*D, M)
    return out.reshape(b, d, -1).transpose(0, 2, 1)
