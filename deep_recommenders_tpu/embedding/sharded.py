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

The multi-hot bag op fuses the combiner into the same exchange: partial
weighted bag-sums are computed per shard BEFORE the psum, so (B, L, D)
never crosses the interconnect.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from deep_recommenders_tpu.parallel.sharding import DATA_AXIS, MODEL_AXIS


def _local_gather(table_shard: jax.Array, ids: jax.Array, axis: str):
    """Gather rows resident on this shard; off-shard rows contribute zeros."""
    size = table_shard.shape[0]
    shard = jax.lax.axis_index(axis)
    local = ids - shard * size
    ok = (local >= 0) & (local < size)
    vecs = jnp.take(table_shard, jnp.where(ok, local, 0), axis=0)
    return jnp.where(ok[..., None], vecs, 0.0)


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
