"""Attention ops: reference SDPA + Pallas blockwise (flash) attention.

Parity: ref deep_recommenders/keras/models/nlp/multi_head_attention.py:35-89
computes QK^T/sqrt(d), additive padding mask tiled over heads, optional
causal mask via a lower-triangular operator, softmax, dropout, @V — all with
the full (S, S) score matrix materialized in memory.

TPU-first: ``flash_attention`` never materializes (S, S): the Pallas kernel
streams K/V blocks through VMEM with an online-softmax running max/sum and
accumulates the output in fp32 scratch (one HBM pass over K/V per Q block).
It serves the Transformer stack (causal + padding masks; DIN proper uses
the reference's MLP ActivationUnit scorer, models/ranking/din.py, not this
kernel), and its block structure is the natural seam for sequence/context
parallelism later (SURVEY §5.7). The jnp path is the semantics oracle and
the CPU/dropout fallback.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def scaled_dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_mask: Optional[jax.Array] = None,
    causal: bool = False,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Reference SDPA. q/k/v: (..., S, D); key_mask: (..., S_k) with 1=valid.

    Scores and softmax statistics are computed in fp32 regardless of the
    input dtype (bf16 mixed precision feeds bf16 q/k/v); the @V contraction
    runs in the input dtype with fp32 accumulation and the output is cast
    back to the input dtype.

    ``dropout_rate``/``dropout_rng``: inverted dropout applied to the
    softmax WEIGHTS before the @V contraction — exactly the reference's
    ``K.dropout(softmax_out, rate)``
    (ref multi_head_attention.py:83). Inactive when either is unset.
    """
    d = q.shape[-1]
    scores = jnp.einsum(
        "...qd,...kd->...qk", q, k, preferred_element_type=jnp.float32
    ) / jnp.sqrt(jnp.float32(d))
    if key_mask is not None:
        scores = jnp.where(
            key_mask[..., None, :] > 0, scores, NEG_INF
        )
    if causal:
        sq, sk = scores.shape[-2], scores.shape[-1]
        rows = jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 1)
        scores = jnp.where(cols <= rows, scores, NEG_INF)
    weights = jax.nn.softmax(scores, axis=-1)
    # Fully-masked rows (padding queries) emit zeros, not a uniform average
    # over masked keys — matches the flash kernel's semantics.
    any_valid = jnp.max(scores, axis=-1, keepdims=True) > NEG_INF / 2
    weights = jnp.where(any_valid, weights, 0.0)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(
            dropout_rng, 1.0 - dropout_rate, weights.shape
        )
        weights = jnp.where(keep, weights / (1.0 - dropout_rate), 0.0)
    out = jnp.einsum(
        "...qk,...kd->...qd", weights.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


def _flash_kernel(
    q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref,
    m_scratch, l_scratch, acc_scratch,
    *, scale: float, causal: bool, block_q: int, block_k: int,
):
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    i = pl.program_id(1)
    # Causal: blocks entirely in the future contribute nothing — skip the
    # matmuls (roughly halves the work for self-attention).
    block_live = (
        jnp.asarray(True)
        if not causal
        else (j * block_k <= i * block_q + block_q - 1)
    )

    @pl.when(block_live)
    def _body():
        # Dots run on NATIVE operand dtype (bf16 inputs -> bf16 MXU passes,
        # 4x the fp32 rate) with fp32 accumulation via
        # preferred_element_type; softmax statistics are always fp32.
        q = q_ref[0]  # (bq, d)
        k = k_ref[0]  # (bk, d)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (bq, bk) f32

        mask = mask_ref[0] > 0  # (1, bk) valid keys
        s = jnp.where(mask, s, NEG_INF)
        if causal:
            rows = (
                jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
                + i * block_q
            )
            cols = (
                jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
                + j * block_k
            )
            s = jnp.where(cols <= rows, s, NEG_INF)

        m_prev = m_scratch[:]  # (bq, 1)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        # Guard fully-masked rows: exp(NEG_INF - NEG_INF) would be exp(0)=1.
        p = jnp.exp(s - m_new)
        p = jnp.where(s <= NEG_INF / 2, 0.0, p)
        alpha = jnp.exp(m_prev - m_new)
        alpha = jnp.where(m_prev <= NEG_INF / 2, 0.0, alpha)
        l_new = alpha * l_scratch[:] + jnp.sum(p, axis=-1, keepdims=True)
        v = v_ref[0]
        acc_scratch[:] = acc_scratch[:] * alpha + jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        m_scratch[:] = m_new
        l_scratch[:] = l_new

    @pl.when(j == nk - 1)
    def _finalize():
        denom = jnp.maximum(l_scratch[:], 1e-30)
        o_ref[0] = (acc_scratch[:] / denom).astype(o_ref.dtype)
        # Log-sum-exp per query row, the residual the blockwise backward
        # rebuilds p from. Fully-masked rows get lse=0 (their backward p is
        # zeroed by the same masks, so the value never matters — it just has
        # to be finite).
        m, l = m_scratch[:], l_scratch[:]
        lse = jnp.where(l > 0, m + jnp.log(jnp.maximum(l, 1e-30)), 0.0)
        lse_ref[0, 0] = lse[:, 0]


@functools.partial(
    jax.jit,
    static_argnames=(
        "causal", "block_q", "block_k", "interpret", "return_lse"
    ),
)
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_mask: Optional[jax.Array] = None,
    causal: bool = False,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
    return_lse: bool = False,
) -> jax.Array:
    """Blockwise attention. q: (BH, Sq, D), k/v: (BH, Sk, D),
    key_mask: (BH, Sk) 1=valid (None = all valid). Returns (BH, Sq, D);
    with ``return_lse`` also the per-row log-sum-exp (BH, Sq) residual for
    the blockwise backward."""
    bh, sq, d = q.shape
    sk = k.shape[1]
    block_q = min(block_q, sq)
    block_k = min(block_k, sk)
    pad_q = (-sq) % block_q
    pad_k = (-sk) % block_k
    if key_mask is None:
        key_mask = jnp.ones((bh, sk), jnp.float32)
    key_mask = key_mask.astype(jnp.float32)
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0)))
    if pad_k:
        k = jnp.pad(k, ((0, 0), (0, pad_k), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad_k), (0, 0)))
        key_mask = jnp.pad(key_mask, ((0, 0), (0, pad_k)))
    sq_p, sk_p = sq + pad_q, sk + pad_k
    grid = (bh, sq_p // block_q, sk_p // block_k)
    mask3 = key_mask[:, None, :]  # (BH, 1, Sk)

    out, lse = pl.pallas_call(
        functools.partial(
            _flash_kernel,
            scale=1.0 / (d**0.5),
            causal=causal,
            block_q=block_q,
            block_k=block_k,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, block_q, d), lambda b, i, j: (b, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, block_k, d), lambda b, i, j: (b, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, block_k, d), lambda b, i, j: (b, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, block_k), lambda b, i, j: (b, 0, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, block_q, d), lambda b, i, j: (b, i, 0),
                memory_space=pltpu.VMEM,
            ),
            # Row-stat layout (BH, 1, Sq): a (1, 1, block_q) block's last two
            # dims are (1 == array dim, block_q) — the only legal TPU tiling
            # for per-row scalars (a (1, block_q) block over (BH, Sq) is
            # rejected by the Mosaic lowering).
            pl.BlockSpec(
                (1, 1, block_q), lambda b, i, j: (b, 0, i),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, sq_p, d), q.dtype),
            jax.ShapeDtypeStruct((bh, 1, sq_p), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, mask3)
    if return_lse:
        return out[:, :sq, :], lse[:, 0, :sq]
    return out[:, :sq, :]


def _causal_zero(p, i, j, block_q, block_k):
    rows = (
        jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        + i * block_q
    )
    cols = (
        jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        + j * block_k
    )
    return jnp.where(cols <= rows, p, 0.0)


def _rebuild_p(q, k, mask_ref, lse_ref, i, j, scale, causal,
               block_q, block_k):
    """Recompute the softmax block p = exp(s - lse) with masks as zeroing
    (never -inf: exp overflow on masked lanes is discarded by the where)."""
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (bq, bk)
    lse = lse_ref[0, 0][:, None]  # (bq, 1)
    p = jnp.where(mask_ref[0] > 0, jnp.exp(s - lse), 0.0)
    if causal:
        p = _causal_zero(p, i, j, block_q, block_k)
    return p


def _flash_bwd_dq_kernel(
    q_ref, k_ref, v_ref, mask_ref, lse_ref, delta_ref, do_ref, dq_ref,
    acc_scratch,
    *, scale: float, causal: bool, block_q: int, block_k: int,
):
    i, j = pl.program_id(1), pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    block_live = (
        jnp.asarray(True)
        if not causal
        else (j * block_k <= i * block_q + block_q - 1)
    )

    @pl.when(block_live)
    def _body():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0]
        p = _rebuild_p(
            q, k, mask_ref, lse_ref, i, j, scale, causal, block_q, block_k
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bq, bk) f32
        ds = p * (dp - delta_ref[0, 0][:, None]) * scale
        acc_scratch[:] += jnp.dot(
            ds.astype(k.dtype), k, preferred_element_type=jnp.float32
        )

    @pl.when(j == nk - 1)
    def _finalize():
        dq_ref[0] = acc_scratch[:].astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    q_ref, k_ref, v_ref, mask_ref, lse_ref, delta_ref, do_ref,
    dk_ref, dv_ref, dk_scratch, dv_scratch,
    *, scale: float, causal: bool, block_q: int, block_k: int,
):
    j, i = pl.program_id(1), pl.program_id(2)  # k block fixed, q blocks scanned
    nq = pl.num_programs(2)

    @pl.when(i == 0)
    def _init():
        dk_scratch[:] = jnp.zeros_like(dk_scratch)
        dv_scratch[:] = jnp.zeros_like(dv_scratch)

    block_live = (
        jnp.asarray(True)
        if not causal
        else (j * block_k <= i * block_q + block_q - 1)
    )

    @pl.when(block_live)
    def _body():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0]
        p = _rebuild_p(
            q, k, mask_ref, lse_ref, i, j, scale, causal, block_q, block_k
        )
        dv_scratch[:] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # p^T @ do: (bk, d)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta_ref[0, 0][:, None]) * scale
        dk_scratch[:] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # ds^T @ q: (bk, d)

    @pl.when(i == nq - 1)
    def _finalize():
        dk_ref[0] = dk_scratch[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scratch[:].astype(dv_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("causal", "block_q", "block_k", "interpret")
)
def _flash_backward_impl(
    q, k, v, key_mask, out, lse, g,
    causal: bool = False,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
):
    """Blockwise (flash) backward: dq/dk/dv without materializing (S, S).

    p is rebuilt per block from the forward's saved log-sum-exp; delta =
    rowsum(dO * O) is a cheap elementwise reduction done here in XLA. Two
    kernels: dq scans K blocks per Q block; dk/dv scan Q blocks per K block —
    both keep fp32 accumulators in VMEM and skip dead causal blocks like the
    forward. Peak memory is O(S*D), not O(S^2).
    """
    bh, sq, d = q.shape
    sk = k.shape[1]
    block_q = min(block_q, sq)
    block_k = min(block_k, sk)
    pad_q = (-sq) % block_q
    pad_k = (-sk) % block_k
    if key_mask is None:
        key_mask = jnp.ones((bh, sk), jnp.float32)
    key_mask = key_mask.astype(jnp.float32)
    delta = jnp.sum(
        g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    )  # (BH, Sq)
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, pad_q), (0, 0)))
        lse = jnp.pad(lse, ((0, 0), (0, pad_q)))
        delta = jnp.pad(delta, ((0, 0), (0, pad_q)))
    if pad_k:
        k = jnp.pad(k, ((0, 0), (0, pad_k), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad_k), (0, 0)))
        key_mask = jnp.pad(key_mask, ((0, 0), (0, pad_k)))
    sq_p, sk_p = sq + pad_q, sk + pad_k
    nq, nk = sq_p // block_q, sk_p // block_k
    mask3 = key_mask[:, None, :]  # (BH, 1, Sk)
    # Row stats in (BH, 1, Sq) layout — see the forward's lse out_spec note.
    lse3 = lse[:, None, :]
    delta3 = delta[:, None, :]
    kwargs = dict(
        scale=1.0 / (d**0.5), causal=causal,
        block_q=block_q, block_k=block_k,
    )

    q_at_i = pl.BlockSpec(
        (1, block_q, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM
    )
    kv_at_j = pl.BlockSpec(
        (1, block_k, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM
    )
    mask_at_j = pl.BlockSpec(
        (1, 1, block_k), lambda b, i, j: (b, 0, j), memory_space=pltpu.VMEM
    )
    row_at_i = pl.BlockSpec(
        (1, 1, block_q), lambda b, i, j: (b, 0, i), memory_space=pltpu.VMEM
    )
    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, **kwargs),
        grid=(bh, nq, nk),
        in_specs=[q_at_i, kv_at_j, kv_at_j, mask_at_j, row_at_i, row_at_i,
                  q_at_i],
        out_specs=q_at_i,
        out_shape=jax.ShapeDtypeStruct((bh, sq_p, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, mask3, lse3, delta3, g)

    # dk/dv grid: (bh, k blocks, q blocks) — index maps see (b, j, i).
    q_at_i2 = pl.BlockSpec(
        (1, block_q, d), lambda b, j, i: (b, i, 0), memory_space=pltpu.VMEM
    )
    kv_at_j2 = pl.BlockSpec(
        (1, block_k, d), lambda b, j, i: (b, j, 0), memory_space=pltpu.VMEM
    )
    mask_at_j2 = pl.BlockSpec(
        (1, 1, block_k), lambda b, j, i: (b, 0, j), memory_space=pltpu.VMEM
    )
    row_at_i2 = pl.BlockSpec(
        (1, 1, block_q), lambda b, j, i: (b, 0, i), memory_space=pltpu.VMEM
    )
    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, **kwargs),
        grid=(bh, nk, nq),
        in_specs=[q_at_i2, kv_at_j2, kv_at_j2, mask_at_j2, row_at_i2,
                  row_at_i2, q_at_i2],
        out_specs=(kv_at_j2, kv_at_j2),
        out_shape=(
            jax.ShapeDtypeStruct((bh, sk_p, d), k.dtype),
            jax.ShapeDtypeStruct((bh, sk_p, d), v.dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, mask3, lse3, delta3, g)
    return dq[:, :sq], dk[:, :sk], dv[:, :sk]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def flash_attention_diff(q, k, v, key_mask, causal, interpret=False):
    return flash_attention(
        q, k, v, key_mask=key_mask, causal=causal, interpret=interpret
    )


def _flash_fwd(q, k, v, key_mask, causal, interpret):
    out, lse = flash_attention(
        q, k, v, key_mask=key_mask, causal=causal, interpret=interpret,
        return_lse=True,
    )
    return out, (q, k, v, key_mask, out, lse)


def _flash_bwd(causal, interpret, residuals, g):
    q, k, v, key_mask, out, lse = residuals
    dq, dk, dv = _flash_backward_impl(
        q, k, v, key_mask, out, lse, g, causal=causal, interpret=interpret
    )
    return dq, dk, dv, None


flash_attention_diff.defvjp(_flash_fwd, _flash_bwd)

# Backward-compatible alias (attention() and round-1 call sites).
_flash_attention_diff = flash_attention_diff


# Dispatch criterion, measured on TPU v5e (fp32 AND bf16, causal fwd+bwd,
# constant total work BH*S = 256k, D = 64):
#
#   S      128   256   512   1024  2048  4096    (us/step, bf16)
#   dense  ~1.1k ~2.4k ~5.0k 8.1k  15.7k 30.8k
#   flash  ~3.9k ~6.1k ~9.4k 13.3k 24.9k 48.4k
#
# XLA's fused dense SDPA wins on TIME at every HBM-feasible size — the
# Pallas kernel's per-block grid overhead never amortizes. What the flash
# kernel buys is MEMORY: O(S*D) residency instead of the dense path's
# (BH, Sq, Sk) fp32 score/softmax tensors, which at e.g. BH=128, S=8192
# would need 34 GB and cannot exist on a 16 GB chip. So the dispatch is on
# the SCORE-TENSOR FOOTPRINT, not sequence length: dense below the budget,
# flash above it (where dense would OOM or thrash HBM).
FLASH_SCORE_BYTES = 2_000_000_000
# In training the dense path does not keep just ONE score-sized tensor:
# the softmax weights are saved for backward, and the backward materializes
# a score-sized gradient — peak residency is a small multiple of
# score_bytes (ADVICE r4: a shape just under a single-tensor threshold
# could still thrash or OOM a 16 GB chip fwd+bwd). 3x is the conservative
# count (weights residual + dweights + one live scores buffer).
DENSE_RESIDENT_SCORE_TENSORS = 3


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_mask: Optional[jax.Array] = None,
    causal: bool = False,
    use_flash: Optional[bool] = None,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
) -> jax.Array:
    """Dispatch: fused dense SDPA wherever its fwd+bwd score-tensor
    residency fits the memory budget (it wins on time at every feasible
    size — measured table above), the O(S)-memory flash kernel beyond.
    Batched heads layout (BH, S, D).

    Attention-weight dropout (ref multi_head_attention.py:83) exists only
    in the dense path — the flash kernel never materializes the weight
    matrix. Auto-dispatch therefore always routes dropout-active calls
    dense; requesting ``use_flash=True`` with active dropout is an error,
    never a silent semantics change."""
    dropout_active = dropout_rate > 0.0 and dropout_rng is not None
    if use_flash is None:
        score_bytes = q.shape[0] * q.shape[1] * k.shape[1] * 4
        use_flash = (
            jax.default_backend() == "tpu"
            and score_bytes * DENSE_RESIDENT_SCORE_TENSORS
            > FLASH_SCORE_BYTES
            and not dropout_active
        )
    if use_flash:
        if dropout_active:
            raise ValueError(
                "attention-weight dropout is not implemented in the flash "
                "kernel (the weight matrix is never materialized); call "
                "with use_flash=False/None for dropout-active steps"
            )
        if key_mask is None:
            key_mask = jnp.ones(k.shape[:2], jnp.float32)
        return _flash_attention_diff(q, k, v, key_mask, causal)
    return scaled_dot_product_attention(
        q, k, v, key_mask=key_mask, causal=causal,
        dropout_rate=dropout_rate, dropout_rng=dropout_rng,
    )
