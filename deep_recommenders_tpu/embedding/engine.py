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
from deep_recommenders_tpu.ops.embedding_kernels import lookup
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


# Features with at most this many buckets are looked up as one-hot matmuls
# (MXU) instead of gathers. The win is in the BACKWARD pass: a gather's
# gradient is a scatter-add, and scatter with heavily-colliding indices (e.g.
# 8192x6 genre ids into 18 rows) serializes on TPU (~500us measured at batch
# 8192), while the transposed one-hot matmul is a dense MXU reduction (~90us).
SMALL_VOCAB_MAX = 256


def _sum_bag(spec, batch: Dict[str, jax.Array], dtype) -> jax.Array:
    """(B, cardinality) bag vector with SUM-combiner semantics.

    Single-valued -> plain one-hot row; multi-valued -> weighted sum of the
    bag's one-hots (combining is thereby fused into the lookup matmul: the
    (B, V) bag times the (V, D) table IS the combined embedding).
    """
    ids = batch[spec.name]
    card = spec.cardinality
    if spec.is_multi:
        wt = batch[spec.name + WEIGHT_SUFFIX]
        oh = jax.nn.one_hot(ids, card, dtype=dtype)  # (B, L, V)
        return jnp.einsum("blv,bl->bv", oh, wt.astype(dtype))
    return jax.nn.one_hot(ids, card, dtype=dtype)


def _mean_denom(spec, batch: Dict[str, jax.Array], b: int) -> jax.Array:
    """(B,) divisor turning a SUM-combined bag into the spec's combiner."""
    if spec.is_multi and spec.combiner == "mean":
        wt = batch[spec.name + WEIGHT_SUFFIX]
        return jnp.maximum(wt.sum(-1), 1.0)
    return jnp.ones((b,), jnp.float32)


def fused_rows(
    table: jax.Array,
    specs: Sequence[Feature],
    offsets: Sequence[int],
    batch: Dict[str, jax.Array],
    *,
    gather=None,
    slice_rows=None,
) -> Tuple[jax.Array, jax.Array]:
    """Per-feature table-row bundles with the combiner fused in.

    The TPU-shaped replacement for a per-feature gather loop. Features are
    routed by cardinality:

    - small vocab (<= SMALL_VOCAB_MAX): ALL such features fold into ONE
      block-diagonal matmul — concat of per-feature bag vectors (B, sum_V)
      times block_diag(table slices) (sum_V, n_small*C). No gathers, no
      scatter-add in the backward pass; everything rides the MXU.
    - large vocab, single-valued: ONE batched row gather (B, n_big) ->
      (B, n_big, C) (one scatter-add in backward instead of n_big).
    - large vocab, multi-valued: per-feature gather + weighted reduction.

    Returns ``(rows, denom)``: rows (B, F, C) holding each feature's
    SUM-combined table rows in spec order, and denom (B, F, 1) — the
    mean-combiner divisor (1.0 where the combiner is sum or the feature is
    single-valued). Callers divide or not depending on their semantics
    (embeddings honor spec.combiner; first-order linear terms always sum,
    matching tf.feature_column.linear_model).

    ``gather(ids) -> rows`` and ``slice_rows(offset, card) -> (card, C)``
    parameterize the row access so the SAME routing/fusion logic runs both
    against the full table (defaults) and against one model-axis shard inside
    the shard_map exchange (embedding/sharded.py: masked local access, so
    non-resident rows contribute zeros and ONE psum completes every feature).
    """
    if gather is None:
        gather = lambda ids: lookup(table, ids)  # noqa: E731
    if slice_rows is None:
        slice_rows = lambda off, card: table[off : off + card]  # noqa: E731
    b = batch[specs[0].name].shape[0]
    c = table.shape[1]
    parts: Dict[int, jax.Array] = {}

    small = [
        (i, s, o)
        for i, (s, o) in enumerate(zip(specs, offsets))
        if s.cardinality <= SMALL_VOCAB_MAX
    ]
    big_single = [
        (i, s, o)
        for i, (s, o) in enumerate(zip(specs, offsets))
        if s.cardinality > SMALL_VOCAB_MAX and not s.is_multi
    ]
    big_multi = [
        (i, s, o)
        for i, (s, o) in enumerate(zip(specs, offsets))
        if s.cardinality > SMALL_VOCAB_MAX and s.is_multi
    ]

    if small:
        bags = jnp.concatenate(
            [_sum_bag(s, batch, table.dtype) for _, s, _ in small], axis=-1
        )  # (B, sum_V)
        blocks = [slice_rows(o, s.cardinality) for _, s, o in small]
        block = jax.scipy.linalg.block_diag(*blocks)  # (sum_V, n*C)
        out = (bags @ block).reshape(b, len(small), c)
        for slot, (i, _, _) in enumerate(small):
            parts[i] = out[:, slot]

    if big_single:
        ids = jnp.stack(
            [batch[s.name] + o for _, s, o in big_single], axis=1
        )  # (B, n_big)
        rows = gather(ids)  # (B, n_big, C); MXU-factored backward
        for slot, (i, _, _) in enumerate(big_single):
            parts[i] = rows[:, slot]

    for i, s, o in big_multi:
        vecs = gather(batch[s.name] + o)  # (B, L, C)
        wt = batch[s.name + WEIGHT_SUFFIX]
        parts[i] = jnp.einsum("blc,bl->bc", vecs, wt.astype(vecs.dtype))

    rows = jnp.stack([parts[i] for i in range(len(specs))], axis=1)
    denom = jnp.stack(
        [_mean_denom(s, batch, b) for s in specs], axis=1
    )[..., None]  # (B, F, 1)
    return rows, denom


class EmbeddingCollection(nn.Module):
    """Embeds a set of categorical features into a stacked (B, F, D) tensor.

    All features share one fused table parameter ``table`` of shape
    (sum_of_cardinalities, dim). Multi-hot features (spec.max_len > 1) are
    combined (mean/sum) with their padding weights before stacking, so every
    feature contributes exactly one D-vector per example.

    When ``mesh`` is set, ALL features go through ONE explicit shard_map
    exchange (embedding/sharded.sharded_fused_rows): each model-axis shard
    runs the full fused_rows routing against its resident rows and a single
    psum carries the stacked (B, F, D) partials — the same formulation (and
    op count) as the single-chip path. Without a mesh, plain gathers + a
    GSPMD sharding constraint are used.
    """

    specs: Tuple[Feature, ...]
    dim: int
    param_dtype: jnp.dtype = jnp.float32
    # Mixed precision: compute dtype of the lookup/combine path. Params stay
    # param_dtype (fp32); with bfloat16 the one-hot bag matmuls and combiner
    # reductions ride the MXU in bf16 and callers get bf16 rows.
    compute_dtype: Optional[jnp.dtype] = None
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
                sharded_fused_rows,
            )

            table = self.table
            if self.compute_dtype is not None:
                table = table.astype(self.compute_dtype)
            rows = sharded_fused_rows(
                table, self.specs, self._feature_offsets, batch,
                self.mesh,
            )  # (B, F, D), SUM-combined — ONE psum for the whole spec set
            b = rows.shape[0]
            denom = jnp.stack(
                [_mean_denom(s, batch, b) for s in self.specs], axis=1
            )[..., None].astype(rows.dtype)
            return with_sharding(rows / denom, P(DATA_AXIS, None, None))

        table = self.table
        if self.compute_dtype is not None:
            table = table.astype(self.compute_dtype)
        if self.shard:
            table = with_sharding(table, P(MODEL_AXIS, None))
        rows, denom = fused_rows(
            table, self.specs, self._feature_offsets, batch
        )
        stacked = rows / denom.astype(rows.dtype)  # (B, F, D), combined
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
        # SUM combiner throughout (linear_model semantics): use the raw
        # sum-combined rows, ignore the mean denominators.
        rows, _ = fused_rows(
            self.weights, self.specs, self._feature_offsets, batch
        )  # (B, F, 1)
        total = rows[..., 0].sum(axis=1, keepdims=True)
        if self.use_bias:
            total = total + self.bias
        return total

    def per_feature(self, batch: Dict[str, jax.Array]) -> jax.Array:
        """Un-summed per-feature first-order weights (B, F) (FNN input,
        ref estimator/models/ranking/fnn.py:76-86)."""
        rows, _ = fused_rows(
            self.weights, self.specs, self._feature_offsets, batch
        )
        return rows[..., 0]


def fused_embedding_linear(
    embeddings: EmbeddingCollection,
    linear: LinearTerms,
    batch: Dict[str, jax.Array],
) -> Tuple[jax.Array, jax.Array]:
    """Joint lookup of embeddings AND first-order weights in ONE table pass.

    FM-family models (FM/DeepFM/FNN) gather both a D-dim embedding and a
    scalar first-order weight for every feature. Doing those as separate
    gathers costs two scatter-adds in the backward pass — and the (V, 1)
    linear table has a pathological TPU layout (1 of 128 lanes used). Here the
    linear weights ride along as column D of a concatenated (V, D+1) operand,
    so the whole FM input is one fused_rows pass; the concat's VJP is a slice,
    putting both gradients in a single scatter.

    Returns ``(stacked, first_order)``: (B, F, D) combined embeddings (spec
    combiners applied) and (B, F) per-feature SUM-combined linear terms
    (callers sum + add ``linear.bias`` for the scalar wide logit, or use
    per-feature for FNN). Requires identical specs on both modules. Under an
    explicit mesh the same fused (V, D+1) operand goes through the single
    shard_map exchange (sharded_fused_rows), so the mesh path keeps the
    one-table-pass formulation — and its single psum — too.
    """
    if embeddings.specs != linear.specs:
        raise ValueError("fused_embedding_linear requires identical specs")
    table = embeddings.table
    if embeddings.compute_dtype is not None:
        table = table.astype(embeddings.compute_dtype)
    if embeddings.mesh is None and embeddings.shard:
        table = with_sharding(table, P(MODEL_AXIS, None))
    w = linear.weights
    if w.shape[0] != table.shape[0]:  # mesh-padded vocab
        w = jnp.pad(w, ((0, table.shape[0] - w.shape[0]), (0, 0)))
    fused = jnp.concatenate([table, w.astype(table.dtype)], axis=1)
    d = embeddings.dim
    if embeddings.mesh is not None:
        from deep_recommenders_tpu.embedding.sharded import (
            sharded_fused_rows,
        )

        rows = sharded_fused_rows(
            fused, embeddings.specs, embeddings._feature_offsets, batch,
            embeddings.mesh,
        )
        b = rows.shape[0]
        denom = jnp.stack(
            [_mean_denom(s, batch, b) for s in embeddings.specs], axis=1
        )[..., None]
    else:
        rows, denom = fused_rows(
            fused, embeddings.specs, embeddings._feature_offsets, batch
        )
    stacked = rows[..., :d] / denom.astype(rows.dtype)
    # First-order terms feed the scalar logit directly — keep them fp32 so
    # the wide sum over features doesn't round in bf16.
    first_order = rows[..., d].astype(jnp.float32)
    return stacked, first_order
