"""ESMM: entire-space multi-task CTCVR model.

Parity: ref deep_recommenders/estimator/models/multi_task_learning/esmm.py:
12-55 — shared input, two parallel towers producing pCVR and pCTR, and
pCTCVR = pCTR * pCVR. Returns (p_cvr, p_ctr, p_ctcvr), each (B, 1), as
probabilities (the product structure requires prob space; towers apply
sigmoid internally).

The reference's "shared input" is a tf.feature_column input_layer (ref
esmm.py:30-33); here that is the optional ``specs`` front end: when feature
specs are given, ESMM owns an EmbeddingCollection and consumes a batch dict
of categorical ids, and ``mesh`` routes the shared table through the
explicit row-sharded shard_map exchange like the rest of the zoo. Without
specs it takes a dense (B, X) tensor directly.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax

from deep_recommenders_tpu.features.columns import Feature
from deep_recommenders_tpu.models.common import MLP


class ESMM(nn.Module):
    cvr_hidden: Tuple[int, ...] = (256, 128)
    ctr_hidden: Tuple[int, ...] = (256, 128)
    # Optional categorical front end (reference's shared input_layer):
    specs: Optional[Tuple[Feature, ...]] = None
    embedding_dim: int = 16
    # Optional jax.sharding.Mesh — requires specs (the shared embedding
    # table is what the mesh partitions).
    mesh: object = None

    @nn.compact
    def __call__(
        self, x, training: bool = False
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        if self.mesh is not None and self.specs is None:
            raise ValueError("ESMM(mesh=...) requires specs (the shared "
                             "embedding table is what the mesh partitions)")
        if self.specs is not None:
            from deep_recommenders_tpu.embedding.engine import (
                EmbeddingCollection,
            )

            stacked = EmbeddingCollection(
                tuple(self.specs), self.embedding_dim, mesh=self.mesh,
                name="embeddings",
            )(x)  # x is the batch dict of ids
            x = stacked.reshape(stacked.shape[0], -1)
        cvr_logit = MLP(self.cvr_hidden, output_dim=1, name="cvr_tower")(
            x, training=training
        )
        ctr_logit = MLP(self.ctr_hidden, output_dim=1, name="ctr_tower")(
            x, training=training
        )
        p_cvr = jax.nn.sigmoid(cvr_logit)
        p_ctr = jax.nn.sigmoid(ctr_logit)
        return p_cvr, p_ctr, p_ctr * p_cvr
