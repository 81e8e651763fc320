"""Dice data-adaptive activation (DIN).

p = sigmoid((x - mean) / sqrt(var + eps)) over the feature axis, blended
with a PReLU: out = where(prelu > 0, p * prelu, (1 - p) * prelu).

Two normalizations are offered (round 5 closes the last documented
divergence by shipping BOTH):
- ``"paper"`` (default): the DIN paper's ``sqrt(variance + eps)``.
- ``"reference"``: the reference computes ``tf.math.reduce_std`` but names
  it ``inputs_var`` and then takes ``sqrt(std + eps)`` — i.e. the square
  root of the STANDARD DEVIATION
  (ref deep_recommenders/keras/models/ranking/din.py:110-121). Select this
  mode for bit-faithful reference behavior.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dice(
    x: jax.Array,
    alpha: jax.Array,
    epsilon: float = 1e-8,
    axis: int = 1,
    normalization: str = "paper",
) -> jax.Array:
    """Dice activation. ``alpha`` is the learnable PReLU slope
    (broadcastable); ``normalization`` is "paper" or "reference" (see
    module docstring)."""
    mean = jnp.mean(x, axis=axis, keepdims=True)
    var = jnp.var(x, axis=axis, keepdims=True)
    if normalization == "paper":
        inv = jax.lax.rsqrt(var + epsilon)
    elif normalization == "reference":
        inv = jax.lax.rsqrt(jnp.sqrt(var) + epsilon)
    else:
        raise ValueError(
            f"normalization must be 'paper' or 'reference', "
            f"got {normalization!r}"
        )
    p = jax.nn.sigmoid((x - mean) * inv)
    prelu = jnp.where(x > 0, x, alpha * x)
    return jnp.where(prelu > 0, p * prelu, (1.0 - p) * prelu)
