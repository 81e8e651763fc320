"""Model artifact round-trip: constructor config + params, script-free reload.

Parity: the reference keras branch's signature property is that every layer
is `@register_keras_serializable` with `get_config()`, so a SavedModel
reloads to identical predictions AND identical configs without the script
that built it (ref tests/keras/test_fm.py:44-65, test_dcn.py:25-45). Here
the zoo models are flax dataclasses, so the config IS the dataclass field
set: ``save_model`` persists the import path + a tagged JSON encoding of the
fields next to an Orbax params checkpoint; ``load_model`` re-imports the
class and reconstructs both, with no reference to the constructing script.

Field encoding is a small tagged scheme (tuples and Feature/CrossedFeature/
DenseFeature specs get type tags) so round-tripped configs compare equal —
the `get_config()` identity the reference tests assert. Non-serializable
runtime fields (a jax Mesh) are stored as null and re-supplied at load time.
"""

from __future__ import annotations

import dataclasses
import importlib
import json
import os
from typing import Any, Dict, Optional, Tuple

from deep_recommenders_tpu.features.columns import (
    CrossedFeature,
    DenseFeature,
    Feature,
)
from deep_recommenders_tpu.training.checkpoints import (
    restore_checkpoint,
    save_checkpoint,
)

_SPEC_TYPES = {
    "Feature": Feature,
    "CrossedFeature": CrossedFeature,
    "DenseFeature": DenseFeature,
}


def _encode(v: Any) -> Any:
    if isinstance(v, tuple(_SPEC_TYPES.values())):
        return {
            "__spec__": type(v).__name__,
            "fields": {
                f.name: _encode(getattr(v, f.name))
                for f in dataclasses.fields(v)
            },
        }
    if isinstance(v, tuple):
        return {"__tuple__": [_encode(x) for x in v]}
    if isinstance(v, list):
        return [_encode(x) for x in v]
    if isinstance(v, dict):
        return {k: _encode(x) for k, x in v.items()}
    if v is None or isinstance(v, (bool, int, float, str)):
        return v
    raise TypeError(
        f"Field value {v!r} ({type(v).__name__}) is not serializable; "
        "runtime-only fields (mesh, callables) must be defaulted/None when "
        "saving"
    )


def _decode(v: Any) -> Any:
    if isinstance(v, dict):
        if "__spec__" in v:
            cls = _SPEC_TYPES[v["__spec__"]]
            return cls(**{k: _decode(x) for k, x in v["fields"].items()})
        if "__tuple__" in v:
            return tuple(_decode(x) for x in v["__tuple__"])
        return {k: _decode(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_decode(x) for x in v]
    return v


# Fields holding runtime objects that cannot (and should not) be persisted.
_RUNTIME_FIELDS = ("mesh", "parent", "name")


def model_config(model) -> Dict[str, Any]:
    """The model's constructor config: all dataclass fields, encoded.

    Runtime-only fields (mesh) are recorded as null; flax-internal fields
    (parent/name) are skipped entirely.
    """
    cfg = {}
    for f in dataclasses.fields(model):
        if f.name in ("parent", "name"):
            continue
        value = getattr(model, f.name)
        if f.name == "mesh":
            cfg[f.name] = None
            continue
        cfg[f.name] = _encode(value)
    return cfg


def save_model(path: str, model, params) -> str:
    """Persist ``config.json`` (class path + fields) and ``params/`` (Orbax).

    The artifact is self-contained: ``load_model(path)`` reconstructs the
    model from its import path and the saved fields, no constructing script
    needed — the SavedModel round-trip property of the reference keras branch.
    """
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    spec = {
        "module": type(model).__module__,
        "class": type(model).__qualname__,
        "config": model_config(model),
    }
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(spec, f, indent=1)
    save_checkpoint(os.path.join(path, "params"), params)
    return path


def load_model(path: str, mesh: Optional[object] = None) -> Tuple[Any, Any]:
    """Rebuild ``(model, params)`` from a ``save_model`` artifact.

    ``mesh`` re-attaches a runtime mesh for models with an explicit-sharding
    field (stored as null in the artifact).
    """
    path = os.path.abspath(path)
    with open(os.path.join(path, "config.json")) as f:
        spec = json.load(f)
    module = importlib.import_module(spec["module"])
    cls = getattr(module, spec["class"])
    kwargs = {k: _decode(v) for k, v in spec["config"].items()}
    if mesh is not None:
        if "mesh" not in kwargs:
            raise ValueError(
                f"{cls.__name__} has no mesh field to re-attach"
            )
        kwargs["mesh"] = mesh
    model = cls(**kwargs)
    params = restore_checkpoint(os.path.join(path, "params"))
    return model, params
