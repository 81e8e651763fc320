"""Sharded embedding engine: fused tables + gathers + combiners.

This subsumes the reference's entire tf.feature_column embedding machinery:
- embedding_column lookups (ref estimator/models/feature_interaction/fm.py:46-54,
  keras/models/ranking/fm.py:47-51) -> one fused-table gather
- indicator columns + tf.feature_column.linear_model first-order terms
  (ref fm.py:43-44, wide_and_deep.py:31-33) -> ``LinearTerms`` (a degenerate
  dim-1 fused table + bias)
- multi-hot VarLen features with mean/sum combiners -> masked weighted
  segment reduction over padded (B, L) bags

TPU-first design:
- ALL features of one collection share a single fused (total_vocab, D) table
  with per-feature row offsets. One big gather instead of F small ones keeps
  the op count low and gives GSPMD one well-shaped operand to shard:
  rows over the "model" mesh axis (P("model", None)). With ids replicated and
  the table row-sharded, XLA lowers the gather to local lookups + collectives
  on ICI — the all-to-all ID/vector exchange of BASELINE.json without
  hand-written NCCL-style code.
- Host-side encoding already produced dense int32 IDs (features/columns.py),
  so the device never sees strings or ragged shapes.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from deep_recommenders_tpu.features.columns import Feature, WEIGHT_SUFFIX
from deep_recommenders_tpu.parallel.sharding import (
    DATA_AXIS,
    MODEL_AXIS,
    with_sharding,
)


def _offsets(specs: Sequence[Feature]) -> Tuple[Tuple[int, ...], int]:
    offs, total = [], 0
    for s in specs:
        offs.append(total)
        total += s.cardinality
    return tuple(offs), total


class EmbeddingCollection(nn.Module):
    """Embeds a set of categorical features into a stacked (B, F, D) tensor.

    All features share one fused table parameter ``table`` of shape
    (sum_of_cardinalities, dim). Multi-hot features (spec.max_len > 1) are
    combined (mean/sum) with their padding weights before stacking, so every
    feature contributes exactly one D-vector per example.

    When ``mesh`` is set, lookups go through the explicit shard_map exchange
    (embedding/sharded.py): local row gather + psum over the "model" axis,
    with the multi-hot combiner fused before the collective. Without a mesh,
    plain gathers + a GSPMD sharding constraint are used.
    """

    specs: Tuple[Feature, ...]
    dim: int
    param_dtype: jnp.dtype = jnp.float32
    shard: bool = True  # constrain the fused table to P("model", None)
    mesh: Optional[object] = None  # jax.sharding.Mesh for the explicit path

    def setup(self):
        offs, total = _offsets(self.specs)
        self._feature_offsets = offs
        if self.mesh is not None:
            # Equal row shards: pad the fused vocab to a multiple of the
            # model-axis size (padding rows are never addressed).
            n_model = self.mesh.shape.get("model", 1)
            total = -(-total // n_model) * n_model
        self.total_vocab = total
        self.table = self.param(
            "table",
            nn.initializers.normal(stddev=1.0 / jnp.sqrt(self.dim)),
            (total, self.dim),
            self.param_dtype,
        )

    def _lookup(self, ids: jax.Array) -> jax.Array:
        table = self.table
        if self.shard:
            table = with_sharding(table, P(MODEL_AXIS, None))
        return jnp.take(table, ids, axis=0)

    def __call__(self, batch: Dict[str, jax.Array]) -> jax.Array:
        """batch: {name: (B,) or (B, L) int32 ids, name__wt: (B, L) f32}."""
        if self.mesh is not None:
            from deep_recommenders_tpu.embedding.sharded import (
                sharded_embedding_bag,
                sharded_lookup,
            )

        per_feature = []
        for spec, off in zip(self.specs, self._feature_offsets):
            ids = batch[spec.name] + off
            if spec.is_multi:
                wt = batch[spec.name + WEIGHT_SUFFIX]  # (B, L)
                if self.mesh is not None:
                    summed = sharded_embedding_bag(
                        self.table, ids, wt, self.mesh,
                        combiner=spec.combiner,
                    )
                else:
                    vecs = self._lookup(ids)  # (B, L, D)
                    summed = jnp.einsum("bld,bl->bd", vecs, wt)
                    if spec.combiner == "mean":
                        denom = jnp.maximum(wt.sum(-1, keepdims=True), 1.0)
                        summed = summed / denom
                per_feature.append(summed)
            else:
                if self.mesh is not None:
                    per_feature.append(
                        sharded_lookup(self.table, ids, self.mesh)
                    )
                else:
                    per_feature.append(self._lookup(ids))  # (B, D)
        stacked = jnp.stack(per_feature, axis=1)  # (B, F, D)
        return with_sharding(stacked, P(DATA_AXIS, None, None))


class LinearTerms(nn.Module):
    """First-order (wide/linear) model over categorical features -> (B, 1).

    Equivalent to tf.feature_column.linear_model over indicator columns
    (ref estimator/models/feature_interaction/fm.py:43-44): a learned scalar
    per bucket, summed across features, plus a bias. Implemented as a fused
    dim-1 embedding table so it shares the engine's gather path.
    """

    specs: Tuple[Feature, ...]
    use_bias: bool = True

    def setup(self):
        offs, total = _offsets(self.specs)
        self._feature_offsets = offs
        self.weights = self.param(
            "weights", nn.initializers.zeros, (total, 1), jnp.float32
        )
        if self.use_bias:
            self.bias = self.param(
                "bias", nn.initializers.zeros, (1,), jnp.float32
            )

    def __call__(self, batch: Dict[str, jax.Array]) -> jax.Array:
        out = jnp.zeros((), jnp.float32)
        total = None
        for spec, off in zip(self.specs, self._feature_offsets):
            ids = batch[spec.name] + off
            w = jnp.take(self.weights, ids, axis=0)  # (B, 1) or (B, L, 1)
            if spec.is_multi:
                wt = batch[spec.name + WEIGHT_SUFFIX][..., None]
                contrib = (w * wt).sum(axis=1)  # sum combiner, like linear_model
            else:
                contrib = w
            total = contrib if total is None else total + contrib
        if self.use_bias:
            total = total + self.bias
        return total
