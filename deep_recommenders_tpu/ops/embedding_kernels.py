"""MXU-factored embedding-gradient kernel (Pallas).

The hot op of every ranking model here is the fused-table lookup
(embedding/engine.py fused_rows): a (B, n) row gather from a (V, C) table.
XLA's forward gather is serviceable on TPU (~2ns/row, latency-bound), but its
backward is a scatter-add that costs ~7ns/row (measured 114us for 16k rows on
v5e) because colliding row updates serialize.

This module replaces the backward with a scatter-free factorization that runs
on the MXU. Write id = hi * L + lo (L = 2^lo_bits) and relayout the table
gradient as dT2[lo, hi*C + c]. Then

    dT2 = Ml^T @ (Mh_e * G_e)

where, per batch tile of BT ids,
    Ml   = onehot(lo)                      (BT, L)     VPU compares
    Mh_e = onehot(hi) expanded over C      (BT, H*C)   small onehot + MXU
    G_e  = g tiled over the H blocks       (BT, H*C)   MXU (g @ fold^T)

i.e. three matmuls and one elementwise multiply — no scatter at all. The
whole dT2 accumulator lives in VMEM across the grid. Measured on v5e at
16k ids into a (10092, 16) table: 61us vs 114us for XLA's scatter-add.

Numerics: mask matrices are exact in bfloat16 (0/1); g is rounded to bf16
before the MXU, accumulation is f32 (`preferred_element_type`). The embedding
gradient therefore carries bf16 input rounding (~1e-3 relative), standard
mixed-precision behavior. Pass ``precision="f32"`` (or run on a non-TPU
backend) to fall back to XLA's exact scatter.

The public entry point is :func:`lookup`, a drop-in ``jnp.take(table, ids,
axis=0)`` whose custom VJP uses XLA's gather forward (faster than an MXU
forward: the one-hot matmul costs B*V*C MACs) and this kernel backward.

Reference parity note: the reference has no analog — embedding gradients are
tf.IndexedSlices applied by the optimizer on CPU. This kernel exists because
the TPU design keeps the full training step device-resident (SURVEY §7.3).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

DEFAULT_LO_BITS = 9
DEFAULT_BLOCK_BATCH = 2048


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:  # no backend at trace time
        return False


def _masks(ids: jax.Array, lo_bits: int, l: int, h: int):
    """One-hot of lo (BT, L) and small one-hot of hi (BT, H), bf16."""
    lo = (ids & (l - 1))[:, None]
    hi = (ids >> lo_bits)[:, None]
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (ids.shape[0], l), 1)
    ml = (lo == iota_l).astype(jnp.bfloat16)
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (ids.shape[0], h), 1)
    mh_small = (hi == iota_h).astype(jnp.bfloat16)
    return ml, mh_small


def _expand_matrix(h: int, c: int):
    """E[h', h*C + cc] = (h' == h): expands (BT, H) -> (BT, H*C) on MXU."""
    r = jax.lax.broadcasted_iota(jnp.int32, (h, h * c), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (h, h * c), 1) // c
    return (r == cc).astype(jnp.bfloat16)


def _fold_matrix(h: int, c: int):
    """S[h*C + cc, c'] = (cc == c'): folds the H blocks back to C columns."""
    r = jax.lax.broadcasted_iota(jnp.int32, (h * c, c), 0) % c
    cc = jax.lax.broadcasted_iota(jnp.int32, (h * c, c), 1)
    return (r == cc).astype(jnp.bfloat16)


def _lhc_to_table(t2: jax.Array, v: int, h: int, l: int, c: int) -> jax.Array:
    return t2.reshape(l, h, c).transpose(1, 0, 2).reshape(h * l, c)[:v]


@functools.partial(
    jax.jit, static_argnames=("num_rows", "lo_bits", "block_batch")
)
def factored_scatter_add(
    g: jax.Array,
    ids: jax.Array,
    num_rows: int,
    lo_bits: int = DEFAULT_LO_BITS,
    block_batch: int = DEFAULT_BLOCK_BATCH,
) -> jax.Array:
    """``zeros((num_rows, C)).at[ids].add(g)`` without a scatter.

    g: (N, C) float32 updates; ids: (N,) int32 row indices.
    Pallas/MXU on TPU; falls back to the XLA scatter elsewhere.
    """
    if not _on_tpu():
        return jnp.zeros((num_rows, g.shape[1]), g.dtype).at[ids].add(g)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, c = g.shape
    l = 1 << lo_bits
    h = (num_rows + l - 1) // l
    bt = min(block_batch, n)
    # pad N to a multiple of bt with zero-g rows pointing at row 0
    n_pad = -(-n // bt) * bt
    if n_pad != n:
        g = jnp.pad(g, ((0, n_pad - n), (0, 0)))
        ids = jnp.pad(ids, (0, n_pad - n))
    grid = n_pad // bt

    def kernel(ids_ref, g_ref, o_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            o_ref[:] = jnp.zeros_like(o_ref)

        ml, mh_small = _masks(ids_ref[i, :], lo_bits, l, h)
        g_e = jax.lax.dot_general(
            g_ref[:].astype(jnp.bfloat16),
            _fold_matrix(h, c).T,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)  # (BT, H*C): g broadcast to every h block
        mh = jax.lax.dot_general(
            mh_small,
            _expand_matrix(h, c),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)  # (BT, H*C): per-row h-block mask
        o_ref[:] += jax.lax.dot_general(
            ml.T,
            mh * g_e,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # Inside a shard_map body the operands carry a varying-mesh-axes (vma)
    # set; the pallas out_shape must declare the union of those or the vma
    # checker rejects the call. Outside shard_map this is a no-op.
    vma = frozenset()
    for operand in (g, ids):
        vma = vma | (getattr(jax.typeof(operand), "vma", None) or frozenset())
    out_shape = (
        jax.ShapeDtypeStruct((l, h * c), jnp.float32, vma=vma)
        if vma
        else jax.ShapeDtypeStruct((l, h * c), jnp.float32)
    )
    dt2 = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(
                (grid, bt), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((bt, c), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((l, h * c), lambda i: (0, 0)),
        out_shape=out_shape,
    )(ids.reshape(grid, bt).astype(jnp.int32), g.astype(jnp.float32))
    return _lhc_to_table(dt2, num_rows, h, l, c).astype(g.dtype)


# --- drop-in lookup with the factored backward -----------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def lookup(table: jax.Array, ids: jax.Array, precision: str = "bf16"):
    """``jnp.take(table, ids, axis=0)`` with an MXU-factored backward.

    ids: any int shape; returns ids.shape + (C,). ``precision="f32"`` keeps
    XLA's exact scatter backward.
    """
    return jnp.take(table, ids, axis=0)


def _lookup_fwd(table, ids, precision):
    return jnp.take(table, ids, axis=0), (ids, table.shape)


def _lookup_bwd(precision, res, g):
    ids, (v, c) = res
    flat_ids = ids.reshape(-1)
    flat_g = g.reshape(-1, c)
    if precision == "f32" or not _on_tpu():
        dt = jnp.zeros((v, c), flat_g.dtype).at[flat_ids].add(flat_g)
    else:
        dt = factored_scatter_add(flat_g, flat_ids, v)
    return dt, None


lookup.defvjp(_lookup_fwd, _lookup_bwd)
