"""Two-tower retrieval: towers + the Retrieval task (SBCNM loss).

Parity: ref deep_recommenders/keras/models/retrieval/sbcnm.py:89-163. The
``Retrieval`` layer there computes scores = Q C^T over in-batch candidates
with labels = eye, optional log-Q correction / accidental-negative removal /
hard-negative mining / temperature, sum-reduced softmax CE, and optionally
updates a FactorizedTopK metric. The loss math lives in
ops/retrieval.in_batch_retrieval_loss (including the pod-wide-negatives
generalization via all_gather over the mesh data axis); this module provides
the model-facing pieces:

- ``TwoTower``: query/candidate towers over categorical features (embedding
  collections + MLP projections to a shared space, L2-normalize optional) —
  the DSSM/YoutubeNet-shaped model the reference's examples assemble ad hoc.
- ``Retrieval``: the task wrapper bundling loss config + metric bank.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from deep_recommenders_tpu.embedding.engine import EmbeddingCollection
from deep_recommenders_tpu.features.columns import Feature
from deep_recommenders_tpu.models.common import MLP
from deep_recommenders_tpu.models.retrieval.factorized_top_k import (
    FactorizedTopK,
)
from deep_recommenders_tpu.ops.retrieval import (
    in_batch_retrieval_loss,
    pod_retrieval_loss,
)


class Tower(nn.Module):
    """One tower: embed categorical features -> MLP -> (B, out_dim).

    ``mesh``: optional jax.sharding.Mesh — routes the embedding lookup
    through the explicit shard_map exchange (fused table row-sharded over
    "model", one psum per step), exactly as DeepFM's production path.
    """

    specs: Tuple[Feature, ...]
    embedding_dim: int = 32
    hidden: Tuple[int, ...] = (64,)
    output_dim: int = 32
    l2_normalize: bool = True
    mesh: Optional[object] = None

    @nn.compact
    def __call__(self, batch, training: bool = False) -> jax.Array:
        stacked = EmbeddingCollection(
            self.specs, self.embedding_dim, name="embeddings",
            mesh=self.mesh,
        )(batch)
        b = stacked.shape[0]
        out = MLP(self.hidden, output_dim=self.output_dim, name="projection")(
            stacked.reshape(b, -1), training=training
        )
        if self.l2_normalize:
            out = out / jnp.maximum(
                jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12
            )
        return out


class TwoTower(nn.Module):
    """Query + candidate towers into a shared embedding space."""

    query_specs: Tuple[Feature, ...]
    candidate_specs: Tuple[Feature, ...]
    embedding_dim: int = 32
    hidden: Tuple[int, ...] = (64,)
    output_dim: int = 32
    l2_normalize: bool = True
    mesh: Optional[object] = None  # sharded-embedding exchange in both towers

    def setup(self):
        self.query_tower = Tower(
            self.query_specs, self.embedding_dim, self.hidden,
            self.output_dim, self.l2_normalize, self.mesh,
        )
        self.candidate_tower = Tower(
            self.candidate_specs, self.embedding_dim, self.hidden,
            self.output_dim, self.l2_normalize, self.mesh,
        )

    def __call__(self, query_batch, candidate_batch, training: bool = False):
        return (
            self.query_tower(query_batch, training=training),
            self.candidate_tower(candidate_batch, training=training),
        )


@dataclasses.dataclass
class Retrieval:
    """The retrieval task: loss config + optional FactorizedTopK metrics
    (ref sbcnm.py:89-163, with the broken optional branches implemented as
    intended).

    Pod-wide negatives, two ways:
    - ``axis_name`` alone: for use INSIDE an existing shard_map/pmap over
      that axis (the raw collective form).
    - ``axis_name`` + ``mesh``: trainable from a plain jitted train step —
      the loss itself opens the shard_map over the mesh's data axis
      (ops/retrieval.pod_retrieval_loss), so a mesh-sharded TwoTower step
      gets global-batch negatives with one all-gather on ICI.
    """

    temperature: Optional[float] = None
    num_hard_negatives: Optional[int] = None
    remove_accidental_negatives: bool = False
    metrics: Optional[FactorizedTopK] = None
    axis_name: Optional[str] = None  # set to "data" for pod-wide negatives
    mesh: Optional[object] = None  # jax.sharding.Mesh for the jit-level form
    # bf16 score-matmul operands (softmax stats and loss stay fp32):
    compute_dtype: Optional[object] = None

    def __call__(
        self,
        query_embeddings: jax.Array,
        candidate_embeddings: jax.Array,
        sample_weight: Optional[jax.Array] = None,
        candidate_sampling_probability: Optional[jax.Array] = None,
        candidate_ids: Optional[jax.Array] = None,
        metric_state=None,
    ):
        """Returns loss, or (loss, updated_metric_state) when metrics set."""
        if self.remove_accidental_negatives and candidate_ids is None:
            raise ValueError(
                "remove_accidental_negatives requires candidate_ids"
            )
        if self.mesh is not None and self.axis_name is not None:
            loss = pod_retrieval_loss(
                query_embeddings,
                candidate_embeddings,
                self.mesh,
                sample_weight=sample_weight,
                candidate_sampling_probability=candidate_sampling_probability,
                candidate_ids=(
                    candidate_ids
                    if self.remove_accidental_negatives
                    else None
                ),
                num_hard_negatives=self.num_hard_negatives,
                temperature=self.temperature,
                data_axis=self.axis_name,
                compute_dtype=self.compute_dtype,
            )
        else:
            loss = in_batch_retrieval_loss(
                query_embeddings,
                candidate_embeddings,
                sample_weight=sample_weight,
                candidate_sampling_probability=candidate_sampling_probability,
                candidate_ids=(
                    candidate_ids
                    if self.remove_accidental_negatives
                    else None
                ),
                num_hard_negatives=self.num_hard_negatives,
                temperature=self.temperature,
                axis_name=self.axis_name,
                compute_dtype=self.compute_dtype,
            )
        if self.metrics is None or metric_state is None:
            return loss
        metric_state = self.metrics.update(
            metric_state, query_embeddings, candidate_embeddings
        )
        return loss, metric_state
