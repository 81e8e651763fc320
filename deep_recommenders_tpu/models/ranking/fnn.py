"""FNN: factorization-machine-supported neural network with FM warm start.

Parity: ref deep_recommenders/estimator/models/ranking/fnn.py:9-90. The
reference's two-phase flow loads an FM SavedModel in a second tf.Session and
name-munges scope-prefixed variables into constant initializers (:32-48).
TPU-native equivalent: FNN's ``linear`` / ``embeddings`` submodules have the
SAME param-tree structure as FactorizationMachine's, so warm start is a pure
pytree graft from an FM checkpoint — see training/warmstart.py
(``warm_start_from``). No second session, no name munging.

Input construction mirrors ref fnn.py:76-86: per-feature first-order weights
concatenated with per-feature embeddings feed the MLP.
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


class FNN(nn.Module):
    specs: Tuple[Feature, ...]
    embedding_dim: int = 16
    hidden: Tuple[int, ...] = (256, 128, 64)
    # Optional jax.sharding.Mesh: fused shard_map embedding exchange.
    mesh: object = None
    # Mixed precision (bf16 compute, fp32 params/logits) — see DeepFM.
    compute_dtype: object = None

    def setup(self):
        self.linear = LinearTerms(self.specs)
        self.embeddings = EmbeddingCollection(
            self.specs, self.embedding_dim, mesh=self.mesh,
            compute_dtype=self.compute_dtype,
        )
        self.deep = MLP(self.hidden, output_dim=1, dtype=self.compute_dtype)

    def __call__(self, batch, training: bool = False) -> jax.Array:
        # Per-feature first-order weights (B, F) + embeddings (B, F, D), in
        # one fused table pass.
        stacked, first_order = fused_embedding_linear(
            self.embeddings, self.linear, batch
        )
        b = stacked.shape[0]
        x = jnp.concatenate(
            [first_order.astype(stacked.dtype), stacked.reshape(b, -1)],
            axis=1,
        )
        return self.deep(x, training=training).astype(jnp.float32)
