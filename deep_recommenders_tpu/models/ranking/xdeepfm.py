"""xDeepFM: CIN layer + full model.

Parity: ref deep_recommenders/keras/models/ranking/xdeepfm.py:8-116. The
reference's split/outer/conv1d choreography is reformulated as tensor
contractions (see ops/cin.py). Error contracts preserved: inputs must be a
(x0, x) pair of 3-D tensors (ref xdeepfm.py:41-48, :75-80).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from deep_recommenders_tpu.embedding.engine import (
    EmbeddingCollection,
    LinearTerms,
)
from deep_recommenders_tpu.features.columns import Feature
from deep_recommenders_tpu.models.common import MLP, resolve_activation
from deep_recommenders_tpu.ops.cin import cin_interaction


class CIN(nn.Module):
    """One compressed-interaction layer: (x0, x) -> (B, feature_map, D)."""

    feature_map: int = 3
    use_bias: bool = False
    activation: str = "sigmoid"

    @nn.compact
    def __call__(self, inputs: Tuple[jax.Array, jax.Array]) -> jax.Array:
        if not isinstance(inputs, (tuple, list)):
            raise ValueError(
                f"`CIN` inputs must be a (x0, x) tuple, got {type(inputs)}"
            )
        if len(inputs) != 2:
            raise ValueError(
                f"`CIN` inputs tuple length should be 2, got {len(inputs)}"
            )
        x0, x = inputs
        if x0.ndim != 3 or x.ndim != 3:
            raise ValueError(
                f"`x0` and `x` must be 3-D, got {x0.ndim} / {x.ndim}"
            )
        f0, f = x0.shape[1], x.shape[1]
        kernel = self.param(
            "kernel",
            nn.initializers.truncated_normal(stddev=0.05),
            (f0, f, self.feature_map),
        )
        out = cin_interaction(x0, x, kernel)  # (B, M, D)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.feature_map,)
            )
            out = out + bias[None, :, None]
        act = resolve_activation(self.activation)
        return act(out) if act is not None else out


class XDeepFM(nn.Module):
    """Full xDeepFM: linear + CIN stack (sum-pooled) + deep MLP -> logits."""

    specs: Tuple[Feature, ...]
    embedding_dim: int = 16
    cin_feature_maps: Tuple[int, ...] = (128, 128)
    cin_activation: str = "relu"
    hidden: Tuple[int, ...] = (256, 128)

    def setup(self):
        self.linear = LinearTerms(self.specs)
        self.embeddings = EmbeddingCollection(self.specs, self.embedding_dim)
        self.cins = [
            CIN(feature_map=m, activation=self.cin_activation)
            for m in self.cin_feature_maps
        ]
        self.deep = MLP(self.hidden, output_dim=1)
        self.cin_head = nn.Dense(1, use_bias=False)

    def __call__(self, batch, training: bool = False) -> jax.Array:
        linear_logit = self.linear(batch)
        x0 = self.embeddings(batch)  # (B, F, D)
        b = x0.shape[0]
        x, pooled = x0, []
        for cin in self.cins:
            x = cin((x0, x))
            pooled.append(jnp.sum(x, axis=-1))  # (B, M) sum over emb dim
        cin_logit = self.cin_head(jnp.concatenate(pooled, axis=-1))
        deep_logit = self.deep(x0.reshape(b, -1), training=training)
        return linear_logit + cin_logit + deep_logit
