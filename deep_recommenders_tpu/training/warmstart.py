"""Warm-start: graft parameter subtrees from one model/checkpoint into another.

Replaces the reference FNN's warm-up dance — loading an FM SavedModel in a
second tf.Session and name-munging scope-prefixed variables into constant
initializers (ref deep_recommenders/estimator/models/ranking/fnn.py:32-48).
Because models here name their shared submodules consistently ("linear",
"embeddings"), warm start is a pure pytree graft: no sessions, no name
munging, and it composes with Orbax checkpoints (restore FM -> graft -> train
FNN).
"""

from __future__ import annotations

import copy
from typing import Any, Sequence, Tuple


def _get(tree: Any, path: Tuple[str, ...]):
    node = tree
    for key in path:
        if not isinstance(node, dict) or key not in node:
            return None
        node = node[key]
    return node


def _set(tree: dict, path: Tuple[str, ...], value: Any):
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = value


def warm_start_from(
    target_params: Any,
    source_params: Any,
    scopes: Sequence[str] = ("linear", "embeddings"),
) -> Any:
    """Return target params with the named top-level scopes replaced by the
    source's. Shapes must match leaf-for-leaf; raises on mismatch."""
    target = copy.deepcopy(dict(target_params))
    for scope in scopes:
        src = _get(source_params, ("params", scope))
        dst = _get(target, ("params", scope))
        if src is None:
            raise KeyError(f"Source has no scope {scope!r}")
        if dst is not None:
            src_shapes = [
                (p, v.shape)
                for p, v in _flatten(src)
            ]
            dst_shapes = [(p, v.shape) for p, v in _flatten(dst)]
            if src_shapes != dst_shapes:
                raise ValueError(
                    f"Scope {scope!r} structure mismatch:\n"
                    f"  source: {src_shapes}\n  target: {dst_shapes}"
                )
        _set(target, ("params", scope), copy.deepcopy(src))
    return target


def _flatten(tree, prefix=()):
    out = []
    if isinstance(tree, dict):
        for k in sorted(tree):
            out += _flatten(tree[k], prefix + (k,))
    else:
        out.append((prefix, tree))
    return out
