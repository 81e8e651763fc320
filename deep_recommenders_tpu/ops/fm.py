"""FM second-order interaction op.

The classic O(F*D) sum-square trick: 0.5 * sum_d[(sum_f v)^2 - sum_f v^2]
over stacked per-feature embeddings (B, F, D) -> (B, 1)
(ref deep_recommenders/estimator/models/feature_interaction/fm.py:10-26 and
keras/models/ranking/fm.py:28-35).

Two implementations:
- ``fm_interaction``: pure jnp. Two reductions + elementwise — XLA fuses this
  into a single VPU pass; it is the default.
- ``fm_interaction_pallas``: a fused Pallas kernel that streams (TB, F*D)
  blocks through VMEM and emits the scalar per row in one pass (one HBM read
  of the embeddings, no intermediate (B, D) sum tensor in HBM). Worth it when
  F*D is large; falls back to jnp off-TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fm_interaction(embeddings: jax.Array) -> jax.Array:
    """(B, F, D) stacked feature embeddings -> (B, 1) interaction logit.

    Reductions accumulate in fp32 regardless of input dtype — under the bf16
    mixed-precision path the (sum)^2 - sum^2 cancellation is exactly the kind
    of expression that loses significance in 8-bit mantissas.
    """
    sum_v = jnp.sum(embeddings, axis=1, dtype=jnp.float32)  # (B, D)
    sum_sq = jnp.sum(jnp.square(sum_v), axis=-1)  # (B,)
    sq_sum = jnp.sum(
        jnp.square(embeddings.astype(jnp.float32)), axis=(1, 2)
    )  # (B,)
    return (0.5 * (sum_sq - sq_sum))[:, None]


def _fm_kernel(emb_ref, out_ref, *, num_fields: int):
    x = emb_ref[:].astype(jnp.float32)  # (TB, F, D)
    sum_v = jnp.sum(x, axis=1)  # (TB, D)
    sum_sq = jnp.sum(jnp.square(sum_v), axis=-1, keepdims=True)
    # Staged >=2-D reductions: a single axis=(1, 2) reduce yields a rank-1
    # intermediate that crashes Mosaic's layout inference (layout.h
    # "arr.size() >= layout_rank" check — found by tests/tpu on-chip).
    sq_sum = jnp.sum(
        jnp.sum(jnp.square(x), axis=1), axis=-1, keepdims=True
    )
    out_ref[:] = 0.5 * (sum_sq - sq_sum)


@functools.partial(jax.jit, static_argnames=("block_b",))
def fm_interaction_pallas(
    embeddings: jax.Array, block_b: int = 256
) -> jax.Array:
    """Fused Pallas FM interaction; identical math to ``fm_interaction``."""
    if jax.default_backend() != "tpu":
        return fm_interaction(embeddings)
    b, f, d = embeddings.shape
    block_b = min(block_b, b)
    if b % block_b != 0:
        return fm_interaction(embeddings)
    return pl.pallas_call(
        functools.partial(_fm_kernel, num_fields=f),
        out_shape=jax.ShapeDtypeStruct((b, 1), jnp.float32),
        grid=(b // block_b,),
        in_specs=[
            pl.BlockSpec(
                (block_b, f, d),
                lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (block_b, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
    )(embeddings)
