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

from deep_recommenders_tpu.embedding.engine import (
    EmbeddingCollection,
    LinearTerms,
)
from deep_recommenders_tpu.features.columns import CrossedFeature, Feature
from deep_recommenders_tpu.models.common import MLP

Spec = Union[Feature, CrossedFeature]


class WideDeep(nn.Module):
    deep_specs: Tuple[Feature, ...]
    wide_specs: Tuple[Spec, ...]  # typically deep_specs + crossed features
    embedding_dim: int = 16
    hidden: Tuple[int, ...] = (256, 128, 64)

    def setup(self):
        self.wide = LinearTerms(self.wide_specs)
        self.embeddings = EmbeddingCollection(self.deep_specs, self.embedding_dim)
        self.deep = MLP(self.hidden, output_dim=1)

    def __call__(self, batch, training: bool = False) -> jax.Array:
        wide_logit = self.wide(batch)
        stacked = self.embeddings(batch)
        b = stacked.shape[0]
        deep_logit = self.deep(stacked.reshape(b, -1), training=training)
        return wide_logit + deep_logit
