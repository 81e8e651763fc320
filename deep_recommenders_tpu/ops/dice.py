"""Dice data-adaptive activation (DIN).

p = sigmoid((x - mean) / sqrt(var + eps)) over the feature axis, blended with
a PReLU: out = where(x > 0, p*x, (1-p)*alpha*x-ish blend. The reference
(ref deep_recommenders/keras/models/ranking/din.py:110-121) computes
``sqrt(reduce_std + eps)`` — i.e. the square root of the standard deviation —
which deviates from the DIN paper; we implement the paper's
``sqrt(variance + eps)`` normalization (documented divergence, SURVEY §2.3)
and keep the reference's where(x>0, p*x, (1-p)*x) blend on top of PReLU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dice(
    x: jax.Array,
    alpha: jax.Array,
    epsilon: float = 1e-8,
    axis: int = 1,
) -> jax.Array:
    """Dice activation. ``alpha`` is the learnable PReLU slope (broadcastable)."""
    mean = jnp.mean(x, axis=axis, keepdims=True)
    var = jnp.var(x, axis=axis, keepdims=True)
    p = jax.nn.sigmoid((x - mean) * jax.lax.rsqrt(var + epsilon))
    prelu = jnp.where(x > 0, x, alpha * x)
    return jnp.where(prelu > 0, p * prelu, (1.0 - p) * prelu)
