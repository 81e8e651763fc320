"""Serving export: the SavedModel-equivalent for the TPU framework.

The reference's serving story is tf.SavedModel: estimator
``export_saved_model`` with a parsing serving receiver (ref
examples/train_fm_on_movielens_estimator.py:74-80) and keras
``model.save``/``load_model`` round-trips (ref tests, SURVEY §4 item 5).

TPU-native equivalent — an exported model directory containing:

- ``predict.hlo``     — the jitted predict function serialized with
  ``jax.export`` (StableHLO): loadable and runnable WITHOUT the model's
  Python class, on any JAX backend/version within compatibility guarantees.
  This is the analog of SavedModel's frozen graph.
- ``params/``         — an Orbax checkpoint of the parameters.
- ``signature.json``  — the input signature (names, shapes with a symbolic
  batch dim, dtypes) so callers can validate feeds, like SavedModel's
  SignatureDef.

``export_model`` writes it; ``load_serving_module`` restores a
:class:`ServingModule` whose ``__call__`` runs the deserialized StableHLO —
no model code needed at serving time.
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from deep_recommenders_tpu.training.checkpoints import (
    restore_checkpoint,
    save_checkpoint,
)


def _signature(batch: Dict[str, jax.Array]) -> Dict[str, Dict[str, Any]]:
    return {
        name: {"shape": ["batch"] + list(np.shape(x)[1:]),
               "dtype": str(jnp.asarray(x).dtype)}
        for name, x in batch.items()
    }


def export_model(
    path: str,
    apply_fn: Callable,
    params: Any,
    sample_batch: Dict[str, jax.Array],
    polymorphic_batch: bool = True,
) -> str:
    """Export ``apply_fn(params, batch)`` as a serving artifact.

    ``polymorphic_batch=True`` exports with a symbolic leading dim so any
    batch size can be served (SavedModel's None batch dim).
    """
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)

    def predict(params, batch):
        return apply_fn(params, batch)

    if polymorphic_batch:
        scope = jax_export.SymbolicScope()
        b = jax_export.symbolic_shape("b", scope=scope)[0]
        batch_specs = {
            k: jax.ShapeDtypeStruct(
                (b,) + tuple(np.shape(v)[1:]), jnp.asarray(v).dtype
            )
            for k, v in sample_batch.items()
        }
    else:
        batch_specs = {
            k: jax.ShapeDtypeStruct(np.shape(v), jnp.asarray(v).dtype)
            for k, v in sample_batch.items()
        }
    param_specs = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), jnp.asarray(x).dtype),
        params,
    )
    exported = jax_export.export(jax.jit(predict))(param_specs, batch_specs)
    with open(os.path.join(path, "predict.hlo"), "wb") as f:
        f.write(exported.serialize())
    save_checkpoint(os.path.join(path, "params"), params)
    with open(os.path.join(path, "signature.json"), "w") as f:
        json.dump(_signature(sample_batch), f, indent=2)
    return path


class ServingModule:
    """A loaded serving artifact: validates feeds and runs the StableHLO."""

    def __init__(self, exported, params, signature):
        self._exported = exported
        self._params = params
        self.signature = signature

    def __call__(self, batch: Dict[str, jax.Array]):
        missing = set(self.signature) - set(batch)
        if missing:
            raise ValueError(f"missing serving inputs: {sorted(missing)}")
        batch = {k: jnp.asarray(v) for k, v in batch.items()
                 if k in self.signature}
        return self._exported.call(self._params, batch)


def load_serving_module(
    path: str, params_template: Optional[Any] = None
) -> ServingModule:
    path = os.path.abspath(path)
    with open(os.path.join(path, "predict.hlo"), "rb") as f:
        exported = jax_export.deserialize(bytearray(f.read()))
    params = restore_checkpoint(os.path.join(path, "params"),
                                params_template)
    with open(os.path.join(path, "signature.json")) as f:
        signature = json.load(f)
    return ServingModule(exported, params, signature)
