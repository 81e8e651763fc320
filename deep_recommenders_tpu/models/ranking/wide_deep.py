"""Wide & Deep: wide linear model (+ crossed features) and a deep MLP tower.

Parity: ref deep_recommenders/estimator/models/ranking/wide_and_deep.py:9-48 —
wide = linear model over indicator (+ crossed) columns, deep = MLP over
concatenated embeddings, output = wide + deep logits. The reference relies on
variable scopes "wide"/"deep" so the example can run FTRL on the wide part
and Adam on the deep part (ref examples/train_wdl_on_movielens_estimator.py:
65-77); here the same split is expressed with optax.multi_transform over the
param-tree paths "wide" / everything-else (see training/optimizers.py).
"""

from __future__ import annotations

from typing import Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from deep_recommenders_tpu.embedding.engine import (
    EmbeddingCollection,
    LinearTerms,
    fused_embedding_linear,
)
from deep_recommenders_tpu.features.columns import CrossedFeature, Feature
from deep_recommenders_tpu.models.common import MLP

Spec = Union[Feature, CrossedFeature]


class WideDeep(nn.Module):
    deep_specs: Tuple[Feature, ...]
    wide_specs: Tuple[Spec, ...]  # typically deep_specs + crossed features
    embedding_dim: int = 16
    hidden: Tuple[int, ...] = (256, 128, 64)
    # Optional jax.sharding.Mesh: the deep embedding table (and, in the
    # fused-wide configuration, the deep features' first-order weights that
    # ride along it) go through the shard_map exchange. The wide extras'
    # scalar table stays replicated — it is tiny by construction.
    mesh: object = None
    # Mixed precision (bf16 compute, fp32 params/logits) — see DeepFM.
    compute_dtype: object = None

    def setup(self):
        # When the wide side covers all the deep features (+ extras such as
        # crossed columns — the reference example's shape), the deep
        # features' first-order weights ride along the embedding table pass
        # (ONE fused lookup instead of two; halves the gather/scatter cost),
        # and only the extras get their own linear pass. Both wide params
        # keep a "wide" path prefix so the example's FTRL/Adam
        # scoped_optimizer split still routes them to FTRL.
        deep_set = set(self.deep_specs)
        extras = tuple(s for s in self.wide_specs if s not in deep_set)
        covers_deep = deep_set <= set(self.wide_specs)
        self._fused_wide = covers_deep
        if covers_deep:
            self.wide_linear = LinearTerms(self.deep_specs, use_bias=False)
            self.wide_extra = (
                LinearTerms(extras, use_bias=True) if extras else None
            )
        else:
            self.wide = LinearTerms(self.wide_specs)
        self.embeddings = EmbeddingCollection(
            self.deep_specs, self.embedding_dim, mesh=self.mesh,
            compute_dtype=self.compute_dtype,
        )
        self.deep = MLP(self.hidden, output_dim=1, dtype=self.compute_dtype)

    def __call__(self, batch, training: bool = False) -> jax.Array:
        if self._fused_wide:
            stacked, lin = fused_embedding_linear(
                self.embeddings, self.wide_linear, batch
            )
            wide_logit = lin.sum(axis=1, keepdims=True)
            if self.wide_extra is not None:
                wide_logit = wide_logit + self.wide_extra(batch)
        else:
            wide_logit = self.wide(batch)
            stacked = self.embeddings(batch)
        b = stacked.shape[0]
        deep_logit = self.deep(stacked.reshape(b, -1), training=training)
        return wide_logit + deep_logit.astype(jnp.float32)
