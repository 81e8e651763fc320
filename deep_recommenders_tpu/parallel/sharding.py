"""Sharding helpers: PartitionSpecs and constraint utilities.

Conventions used throughout the framework:

- Activations: batch dim sharded over "data"   -> P("data", ...)
- Embedding tables: rows sharded over "model"  -> P("model", None)
- Dense tower params: replicated               -> P()

These are applied either via NamedSharding on inputs/params or via
``with_sharding_constraint`` inside jitted functions, letting GSPMD insert
the collectives (psum for DP grads, all-gather/all-to-all for sharded
tables) on ICI.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def table_sharding(mesh: Mesh) -> NamedSharding:
    """Row-shard a (vocab, dim) embedding table over the model axis."""
    return NamedSharding(mesh, P(MODEL_AXIS, None))


def with_sharding(x: Any, spec: P) -> Any:
    """Apply a sharding constraint inside jit; no-op outside a mesh context."""
    try:
        return jax.lax.with_sharding_constraint(x, spec)
    except (ValueError, RuntimeError):
        return x


def shard_batch(batch: Any, mesh: Optional[Mesh]) -> Any:
    """Device-put a host batch with the leading dim sharded over "data"."""
    if mesh is None:
        return jax.tree.map(jax.numpy.asarray, batch)

    def _put(x):
        sharding = NamedSharding(mesh, P(DATA_AXIS, *([None] * (x.ndim - 1))))
        return jax.device_put(x, sharding)

    return jax.tree.map(_put, batch)
