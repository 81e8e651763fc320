"""Streaming metrics as pure-JAX reducers.

The reference delegates metrics to TF (tf.metrics.auc in the estimator
examples, keras AUC/Precision/Recall in the keras ones, per-task
tf.summary scalars for MMoE; SURVEY §5.5). Here each metric is a pytree
state + pure ``init/update/merge/compute`` functions, so updates run INSIDE
the jitted eval step (no host sync per batch) and states merge across data
shards with a psum — the multi-host story falls out of the algebra.

AUC follows tf.metrics.auc's thresholded-confusion-matrix construction
(num_thresholds buckets, trapezoidal ROC integration), so values are
comparable with the reference's reported AUC.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class AUC:
    """Streaming ROC-AUC over sigmoid scores in [0, 1].

    The threshold grid spans [0, 1], so raw logits fed here would produce a
    plausible-looking but wrong value. Pass ``from_logits=True`` to sigmoid
    inside the update; otherwise predictions are clipped to [0, 1] (a no-op
    for probabilities, and a guard against small numeric overshoot).
    """

    num_thresholds: int = 200
    from_logits: bool = False

    def init(self) -> Dict[str, jax.Array]:
        # Distinct buffers per counter: these states are donated in jitted
        # eval steps, and aliased buffers cannot be donated twice.
        def z():
            return jnp.zeros((self.num_thresholds,), jnp.float32)

        return {"tp": z(), "fp": z(), "tn": z(), "fn": z()}

    def update(self, state, labels: jax.Array, predictions: jax.Array):
        """labels: (B,) or (B, 1); predictions: same shape, probabilities in
        [0, 1] (or logits with ``from_logits=True``)."""
        labels = labels.reshape(-1).astype(jnp.float32)
        preds = predictions.reshape(-1)
        if self.from_logits:
            preds = jax.nn.sigmoid(preds)
        else:
            preds = jnp.clip(preds, 0.0, 1.0)
        # Threshold grid mirroring tf.metrics.auc: (0, ..., 1) inclusive-ish.
        eps = 1e-7
        thresholds = jnp.linspace(
            0.0 - eps, 1.0 + eps, self.num_thresholds
        )
        pred_pos = preds[None, :] > thresholds[:, None]  # (T, B)
        lab_pos = labels[None, :] > 0.5
        tp = jnp.sum(pred_pos & lab_pos, axis=1)
        fp = jnp.sum(pred_pos & ~lab_pos, axis=1)
        fn = jnp.sum(~pred_pos & lab_pos, axis=1)
        tn = jnp.sum(~pred_pos & ~lab_pos, axis=1)
        return {
            "tp": state["tp"] + tp,
            "fp": state["fp"] + fp,
            "tn": state["tn"] + tn,
            "fn": state["fn"] + fn,
        }

    @staticmethod
    def merge(a, b):
        return jax.tree.map(jnp.add, a, b)

    @staticmethod
    def compute(state) -> jax.Array:
        eps = 1e-7
        tpr = state["tp"] / (state["tp"] + state["fn"] + eps)
        fpr = state["fp"] / (state["fp"] + state["tn"] + eps)
        # Thresholds ascend => fpr/tpr descend; integrate |d fpr| * mean tpr.
        return jnp.sum(
            (fpr[:-1] - fpr[1:]) * (tpr[:-1] + tpr[1:]) / 2.0
        )


@dataclasses.dataclass(frozen=True)
class PrecisionRecall:
    """Precision / recall at a fixed decision threshold."""

    threshold: float = 0.5

    def init(self):
        z = jnp.zeros((), jnp.float32)
        return {"tp": z, "fp": z, "fn": z}

    def update(self, state, labels, predictions):
        labels = labels.reshape(-1) > 0.5
        preds = predictions.reshape(-1) > self.threshold
        return {
            "tp": state["tp"] + jnp.sum(preds & labels),
            "fp": state["fp"] + jnp.sum(preds & ~labels),
            "fn": state["fn"] + jnp.sum(~preds & labels),
        }

    @staticmethod
    def merge(a, b):
        return jax.tree.map(jnp.add, a, b)

    @staticmethod
    def compute(state):
        eps = 1e-7
        return {
            "precision": state["tp"] / (state["tp"] + state["fp"] + eps),
            "recall": state["tp"] / (state["tp"] + state["fn"] + eps),
        }


class Mean:
    """Streaming mean (loss, MSE, accuracy...)."""

    @staticmethod
    def init():
        return {"total": jnp.zeros((), jnp.float32),
                "count": jnp.zeros((), jnp.float32)}

    @staticmethod
    def update(state, values, weight=None):
        values = jnp.asarray(values, jnp.float32).reshape(-1)
        if weight is None:
            total = jnp.sum(values)
            count = values.size * jnp.ones((), jnp.float32)
        else:
            w = jnp.asarray(weight, jnp.float32).reshape(-1)
            total = jnp.sum(values * w)
            count = jnp.sum(w)
        return {"total": state["total"] + total,
                "count": state["count"] + count}

    @staticmethod
    def merge(a, b):
        return jax.tree.map(jnp.add, a, b)

    @staticmethod
    def compute(state):
        return state["total"] / jnp.maximum(state["count"], 1e-12)


def binary_accuracy(labels, predictions, threshold: float = 0.5):
    labels = labels.reshape(-1) > 0.5
    preds = predictions.reshape(-1) > threshold
    return jnp.mean((labels == preds).astype(jnp.float32))
