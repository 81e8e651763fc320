"""DeepFM: FM + deep tower over SHARED embeddings -> (B, 1) logits.

Parity: the reference's defining property is that the DNN consumes the same
embedding tables as the FM second-order term
(ref deep_recommenders/estimator/models/ranking/deepfm.py:33-34 and
keras/models/ranking/deepfm.py:36-47): logits = linear + fm + mlp(flatten(emb)).
Here that sharing is structural — one EmbeddingCollection feeds both heads,
so its gradient accumulates both signals in a single backward pass.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from deep_recommenders_tpu.embedding.engine import (
    EmbeddingCollection,
    LinearTerms,
    fused_embedding_linear,
)
from deep_recommenders_tpu.features.columns import Feature
from deep_recommenders_tpu.models.common import MLP
from deep_recommenders_tpu.ops.fm import fm_interaction


class DeepFM(nn.Module):
    specs: Tuple[Feature, ...]
    embedding_dim: int = 16
    hidden: Tuple[int, ...] = (256, 32)
    dropout: float = 0.0
    # Optional jax.sharding.Mesh: routes embedding lookups through the
    # explicit shard_map exchange (row-sharded table over "model").
    mesh: object = None
    # Mixed precision: bfloat16 runs lookups + deep tower on the MXU in
    # bf16; params/optimizer state and the returned logits stay fp32 (the
    # FM sum-square reduction always accumulates fp32, ops/fm.py).
    compute_dtype: object = None

    def setup(self):
        self.linear = LinearTerms(self.specs)
        self.embeddings = EmbeddingCollection(
            self.specs, self.embedding_dim, mesh=self.mesh,
            compute_dtype=self.compute_dtype,
        )
        self.deep = MLP(
            self.hidden, output_dim=1,
            dropout=self.dropout if self.dropout else None,
            dtype=self.compute_dtype,
        )

    def __call__(self, batch, training: bool = False) -> jax.Array:
        # One fused table pass for embeddings + first-order weights; under a
        # mesh the same fused operand rides the single shard_map exchange.
        stacked, lin = fused_embedding_linear(
            self.embeddings, self.linear, batch
        )
        first_order = lin.sum(axis=1, keepdims=True) + self.linear.bias
        fm_logit = fm_interaction(stacked)
        b = stacked.shape[0]
        deep_logit = self.deep(stacked.reshape(b, -1), training=training)
        return first_order + fm_logit + deep_logit.astype(jnp.float32)
