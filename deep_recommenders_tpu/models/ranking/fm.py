"""Factorization Machine: layer + end-to-end model.

Parity targets:
- FM layer combining a linear term with the sum-square pairwise interaction,
  degrading to linear-only when no embeddings are given
  (ref deep_recommenders/keras/models/ranking/fm.py:23-37).
- FactorizationMachine end-to-end model: first-order linear model over
  categorical features + second-order interaction over shared embeddings
  (ref keras/models/ranking/fm.py:40-72 and
  estimator/models/feature_interaction/fm.py:29-56).

All ranking models in this framework return LOGITS (B, 1); apply
jax.nn.sigmoid for probabilities. (The reference returns sigmoid outputs and
pairs them with prob-space BCE; logits + BCE-with-logits is the numerically
stable equivalent.)
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from deep_recommenders_tpu.embedding.engine import (
    EmbeddingCollection,
    LinearTerms,
    fused_embedding_linear,
)
from deep_recommenders_tpu.features.columns import Feature
from deep_recommenders_tpu.ops.fm import fm_interaction


class FMLayer(nn.Module):
    """The FM kernel as a layer over pre-computed inputs.

    ``sparse_inputs`` is a (B, S) multi-hot/indicator matrix fed through a
    zero-initialized linear head (ref fm.py:14-21); ``embedding_inputs`` is
    the stacked (B, F, D) embeddings. Degrades to linear-only when
    ``embedding_inputs`` is None (ref fm.py:25-26).
    """

    @nn.compact
    def __call__(
        self,
        sparse_inputs: jax.Array,
        embedding_inputs: Optional[jax.Array] = None,
    ) -> jax.Array:
        linear = nn.Dense(1, kernel_init=nn.initializers.zeros, name="linear")(
            sparse_inputs
        )
        if embedding_inputs is None:
            return linear
        return linear + fm_interaction(embedding_inputs)


class FactorizationMachine(nn.Module):
    """End-to-end FM over categorical features -> (B, 1) logits.

    ``mesh``: optional jax.sharding.Mesh — embedding + first-order weights
    ride ONE fused shard_map exchange (table row-sharded over "model").
    """

    specs: Tuple[Feature, ...]
    embedding_dim: int = 16
    mesh: object = None
    # Mixed precision (bf16 compute, fp32 params/logits) — see DeepFM.
    compute_dtype: object = None

    def setup(self):
        self.linear = LinearTerms(self.specs)
        self.embeddings = EmbeddingCollection(
            self.specs, self.embedding_dim, mesh=self.mesh,
            compute_dtype=self.compute_dtype,
        )

    def __call__(self, batch, training: bool = False) -> jax.Array:
        del training
        # One fused table pass for embeddings + first-order weights.
        stacked, lin = fused_embedding_linear(self.embeddings, self.linear, batch)
        first_order = lin.sum(axis=1, keepdims=True) + self.linear.bias
        return first_order + fm_interaction(stacked)
