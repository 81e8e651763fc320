"""Checkpointing via Orbax: sharded pytrees, resume, warm-start interchange.

The reference delegates checkpoints to TF (RunConfig save_checkpoints_steps /
SavedModel export; SURVEY §5.4). Here: Orbax StandardCheckpointer over the
TrainState pytree — it writes per-shard arrays (so a row-sharded embedding
table checkpoints without gathering to one host) and restores under any new
mesh by resharding.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def save_checkpoint(path: str, state: Any, force: bool = True) -> str:
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=force)
    return path


def restore_checkpoint(path: str, template: Optional[Any] = None) -> Any:
    """Restore a pytree. ``template`` (abstract or concrete) pins structure,
    dtypes and shardings; without it the raw saved tree is returned."""
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if template is None:
            return ckptr.restore(path)
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
        return ckptr.restore(path, abstract)


def list_step_dirs(root: str) -> list:
    """All checkpoint dirs under root (step_N naming), ordered by step."""
    if not os.path.isdir(root):
        return []
    entries = [e for e in os.listdir(root) if e.startswith("step_")]
    entries.sort(key=lambda e: int(e.split("_")[1]))
    return [os.path.join(root, e) for e in entries]


def latest_step_dir(root: str) -> Optional[str]:
    """Return the lexically-latest checkpoint dir under root (step_N naming)."""
    dirs = list_step_dirs(root)
    return dirs[-1] if dirs else None
