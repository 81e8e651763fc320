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


def host_array(x: Any, mesh: Mesh, spec: P) -> Any:
    """Build a global array on the mesh from THIS process's local data.

    Single-process: a plain sharded device_put. Multi-process (pod slice /
    multi-host): ``jax.make_array_from_process_local_data`` — each host
    contributes only its local shard of the global array (its slice of the
    batch for P("data", ...), or an identical full copy for replicated P()),
    and JAX assembles the global Array without any host ever holding the
    whole thing. This is the multi-host ingest seam of SURVEY §5.8.
    """
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() > 1:
        import numpy as np

        return jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        )
    return jax.device_put(x, sharding)


def shard_batch(batch: Any, mesh: Optional[Mesh]) -> Any:
    """Assemble a global batch with the leading dim sharded over "data".

    Multi-process: each host passes its PROCESS-LOCAL slice of the global
    batch (global batch = per-host batch x process_count along axis 0).
    """
    if mesh is None:
        return jax.tree.map(jax.numpy.asarray, batch)

    def _put(x):
        return host_array(x, mesh, P(DATA_AXIS, *([None] * (x.ndim - 1))))

    return jax.tree.map(_put, batch)


def replicate_on_mesh(x: Any, mesh: Mesh) -> Any:
    """Fully-replicated global array (every host passes an identical copy)."""
    return host_array(x, mesh, P())
