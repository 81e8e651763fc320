"""Explicit cross-shard embedding exchange (shard_map over the model axis).

Why not let GSPMD partition the gather: with the fused table row-sharded
over "model" and ids replicated, the SPMD partitioner may materialize an
all-gather of the TABLE (the one tensor that doesn't fit one chip — that's
why it is sharded). This module pins the communication pattern instead:

    each shard gathers only its resident rows (off-shard rows -> 0)
    psum over "model" combines the partial vectors on ICI

Per step this moves exactly one (B, F, D) activation per shard — equivalent
bandwidth to the all-to-all+all-gather exchange for replicated ids, with a
far simpler schedule — and the transpose rule of psum gives each shard a
scatter-add of ONLY its local rows in the backward (the sharded-gradient
exchange of BASELINE.json).

``sharded_fused_rows`` is the production path (round 2): ONE shard_map /
ONE psum for a whole EmbeddingCollection, running the engine's full fused
routing (small-vocab block-diagonal matmul, one batched big gather,
bag-combine-before-collective) per shard — so the mesh formulation is the
single-chip formulation, just masked to resident rows. ``sharded_lookup``
and ``sharded_embedding_bag`` remain as single-feature primitives.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from deep_recommenders_tpu.ops.embedding_kernels import lookup
from deep_recommenders_tpu.parallel.sharding import DATA_AXIS, MODEL_AXIS


def _local_gather(table_shard: jax.Array, ids: jax.Array, axis: str):
    """Gather rows resident on this shard; off-shard rows contribute zeros."""
    size = table_shard.shape[0]
    shard = jax.lax.axis_index(axis)
    local = ids - shard * size
    ok = (local >= 0) & (local < size)
    vecs = jnp.take(table_shard, jnp.where(ok, local, 0), axis=0)
    return jnp.where(ok[..., None], vecs, 0.0)


def local_access_fns(table_shard: jax.Array, model_axis: str):
    """``(gather, slice_rows)`` against ONE row-shard of the fused table.

    Both mask non-resident rows to zero, so summing the per-shard partials
    (one psum) reconstructs the dense result. ``gather`` keeps the
    MXU-factored backward of ops/embedding_kernels.lookup — masked ids point
    at row 0 with zero gradient, so the scatter-free VJP stays exact.
    """
    size = table_shard.shape[0]
    base = jax.lax.axis_index(model_axis) * size

    def gather(ids: jax.Array) -> jax.Array:
        local = ids - base
        ok = (local >= 0) & (local < size)
        vecs = lookup(table_shard, jnp.where(ok, local, 0))
        return jnp.where(ok[..., None], vecs, 0.0)

    def slice_rows(off: int, card: int) -> jax.Array:
        # The feature's [off, off+card) window intersected with this shard's
        # residency; contiguous distinct indices, so the take's backward is a
        # collision-free (windowed dense) scatter.
        idx = off + jnp.arange(card) - base
        ok = (idx >= 0) & (idx < size)
        rows = jnp.take(table_shard, jnp.where(ok, idx, 0), axis=0)
        return jnp.where(ok[:, None], rows, 0.0)

    return gather, slice_rows


def sharded_fused_rows(
    table: jax.Array,
    specs: Sequence,
    offsets: Sequence[int],
    batch: Dict[str, jax.Array],
    mesh: Mesh,
    *,
    model_axis: str = MODEL_AXIS,
    data_axis: str = DATA_AXIS,
    data_sharded: bool = True,
) -> jax.Array:
    """ONE fused exchange for ALL features of a collection.

    Inside a single shard_map, each model-axis shard runs the full
    engine.fused_rows routing (small-vocab block-diagonal matmul, batched big
    gather, multi-hot bag reduce) against its resident rows only, producing a
    partial SUM-combined (B, F, C) where non-resident rows contribute zeros;
    ONE psum over "model" completes every feature simultaneously. This is the
    mesh path brought to parity with the single-chip formulation: 1 collective
    per step instead of one per feature, with the small-vocab MXU route and
    the scatter-free lookup backward intact under the mesh.

    Returns SUM-combined rows (B, F, C); mean-combiner division (which needs
    no table access) happens outside, on the data-parallel side.
    """
    from deep_recommenders_tpu.features.columns import WEIGHT_SUFFIX

    names = []
    for s in specs:
        names.append(s.name)
        if s.is_multi:
            names.append(s.name + WEIGHT_SUFFIX)
    leaves = [batch[n] for n in names]
    if data_sharded:
        leaf_specs = tuple(
            P(data_axis, *([None] * (x.ndim - 1))) for x in leaves
        )
        out_spec = P(data_axis, None, None)
    else:
        leaf_specs = tuple(P() for _ in leaves)
        out_spec = P()

    def _fn(table_shard, *leaf_vals):
        from deep_recommenders_tpu.embedding.engine import fused_rows

        if data_sharded:
            # Mark the (data-replicated) table shard as varying over "data"
            # so the transpose psums the per-data-shard table cotangents —
            # required because lookup's custom VJP opts out of the automatic
            # replication-inference that would otherwise insert that psum.
            table_shard = jax.lax.pcast(table_shard, data_axis, to="varying")
        local_batch = dict(zip(names, leaf_vals))
        gather, slice_rows = local_access_fns(table_shard, model_axis)
        rows, _ = fused_rows(
            table_shard, specs, offsets, local_batch,
            gather=gather, slice_rows=slice_rows,
        )
        return jax.lax.psum(rows, model_axis)

    return jax.shard_map(
        _fn,
        mesh=mesh,
        in_specs=(P(model_axis, None),) + leaf_specs,
        out_specs=out_spec,
    )(table, *leaves)


def sharded_lookup(
    table: jax.Array,
    ids: jax.Array,
    mesh: Mesh,
    *,
    data_sharded: bool = True,
    model_axis: str = MODEL_AXIS,
    data_axis: str = DATA_AXIS,
) -> jax.Array:
    """(V, D) row-sharded table x (B,) or (B, L) ids -> (B[, L], D)."""
    ids_spec = P(data_axis) if data_sharded else P()
    out_spec = (
        P(data_axis, *([None] * ids.ndim))
        if data_sharded
        else P()
    )

    def _fn(table_shard, ids):
        vecs = _local_gather(table_shard, ids, model_axis)
        return jax.lax.psum(vecs, model_axis)

    return jax.shard_map(
        _fn,
        mesh=mesh,
        in_specs=(P(model_axis, None), ids_spec),
        out_specs=out_spec,
    )(table, ids)


def sharded_embedding_bag(
    table: jax.Array,
    ids: jax.Array,
    weights: jax.Array,
    mesh: Mesh,
    *,
    combiner: str = "mean",
    data_sharded: bool = True,
    model_axis: str = MODEL_AXIS,
    data_axis: str = DATA_AXIS,
) -> jax.Array:
    """Multi-hot bag lookup+combine: (B, L) ids/weights -> (B, D).

    The weighted bag reduction happens per shard BEFORE the psum so only
    (B, D) crosses the interconnect, not (B, L, D).
    """
    ids_spec = P(data_axis, None) if data_sharded else P()
    out_spec = P(data_axis, None) if data_sharded else P()

    def _fn(table_shard, ids, weights):
        vecs = _local_gather(table_shard, ids, model_axis)  # (B, L, D)
        summed = jnp.einsum("bld,bl->bd", vecs, weights)
        return jax.lax.psum(summed, model_axis)

    out = jax.shard_map(
        _fn,
        mesh=mesh,
        in_specs=(P(model_axis, None), ids_spec, ids_spec),
        out_specs=out_spec,
    )(table, ids, weights)
    if combiner == "mean":
        denom = jnp.maximum(weights.sum(-1, keepdims=True), 1.0)
        out = out / denom
    return out
