"""Compressed Interaction Network (xDeepFM) op.

The reference builds CIN by splitting the embedding dim into D slices, taking
a per-slice outer product and running conv1d with a (1, F0*F, M) kernel over
the result (ref deep_recommenders/keras/models/ranking/xdeepfm.py:82-96).
That split/transpose/conv choreography is a TF-graph idiom; mathematically
one layer is a single tensor contraction:

    out[b, m, d] = sum_{f,g} x0[b, f, d] * x[b, g, d] * W[f, g, m]

which we express directly as einsums so XLA can schedule it on the MXU and
pick the contraction order (avoiding the naive (B, F0, F, D) materialization
when it is large — e.g. contracting x with W first gives a (B, F0, M, D)
intermediate when M < F).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cin_interaction(
    x0: jax.Array, x: jax.Array, kernel: jax.Array
) -> jax.Array:
    """One CIN layer.

    Args:
      x0: (B, F0, D) the original stacked feature embeddings.
      x: (B, F, D) the previous CIN layer output (x0 at layer 0).
      kernel: (F0, F, M) compression weights — the reshaped equivalent of the
        reference's conv1d kernel (ref xdeepfm.py:54-60).

    Returns:
      (B, M, D) feature maps.
    """
    if x0.shape[0] != x.shape[0] or x0.shape[2] != x.shape[2]:
        raise ValueError(f"Incompatible CIN inputs {x0.shape} / {x.shape}")
    # Contract x against the kernel first: (B, F, D),(F0, F, M) -> (B, F0, M, D)
    t = jnp.einsum("bgd,fgm->bfmd", x, kernel)
    return jnp.einsum("bfd,bfmd->bmd", x0, t)
