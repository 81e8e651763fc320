"""Loss functions (logit-space, numerically stable).

The reference pairs sigmoid outputs with prob-space losses
(tf.losses.log_loss / keras BinaryCrossentropy); our models return logits and
these losses consume logits directly.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def binary_cross_entropy(
    logits: jax.Array, labels: jax.Array, reduction: str = "mean"
) -> jax.Array:
    """Sigmoid BCE from logits: max(x,0) - x*y + log(1 + exp(-|x|))."""
    logits = logits.reshape(-1)
    labels = labels.reshape(-1).astype(logits.dtype)
    per = (
        jnp.maximum(logits, 0.0)
        - logits * labels
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
    if reduction == "mean":
        return per.mean()
    if reduction == "sum":
        return per.sum()
    return per


def mean_squared_error(predictions: jax.Array, labels: jax.Array) -> jax.Array:
    return jnp.mean(jnp.square(predictions - labels))


def softmax_cross_entropy(
    logits: jax.Array,
    labels: jax.Array,
    reduction: str = "mean",
    mask: Optional[jax.Array] = None,
) -> jax.Array:
    """CE from logits against dense (possibly soft) label distributions."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    per = -jnp.sum(labels * logp, axis=-1)
    if mask is not None:
        per = per * mask
        if reduction == "mean":
            return per.sum() / jnp.maximum(mask.sum(), 1e-12)
    if reduction == "mean":
        return per.mean()
    if reduction == "sum":
        return per.sum()
    return per


def label_smoothing(labels: jax.Array, epsilon: float = 0.1) -> jax.Array:
    """(1 - eps) * y + eps / K (ref keras/models/nlp/transformer.py:320-324)."""
    k = labels.shape[-1]
    return (1.0 - epsilon) * labels + epsilon / k
