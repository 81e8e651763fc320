"""Device mesh construction for the (data, model) 2-D mesh.

The reference framework is single-process CPU with no distribution strategy
(ref: examples/train_deepfm_on_movielens_estimator.py:59 pins GPU count to 0).
Scale-out is green-field design space here: a 2-D logical mesh

    ("data", "model")

where the "data" axis carries data parallelism (batch sharding + psum of
gradients) and the "model" axis carries row-sharded embedding tables and
tensor-parallel dense layers. On a TPU slice both axes ride ICI; multi-host
runs extend the same mesh over DCN via jax.distributed.initialize().
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Logical mesh shape. -1 means "all remaining devices"."""

    data: int = -1
    model: int = 1

    def resolve(self, n_devices: int) -> tuple[int, int]:
        data, model = self.data, self.model
        if data == -1 and model == -1:
            raise ValueError("At most one mesh axis may be -1")
        if model == -1:
            model = n_devices // max(data, 1)
        if data == -1:
            data = n_devices // max(model, 1)
        if data * model != n_devices:
            raise ValueError(
                f"Mesh {data}x{model} does not cover {n_devices} devices"
            )
        return data, model


def create_mesh(
    config: MeshConfig | None = None,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
    axis_names: tuple[str, str] = ("data", "model"),
) -> Mesh:
    """Build a 2-D ("data", "model") mesh over the given (or all) devices."""
    config = config or MeshConfig()
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    data, model = config.resolve(len(devices))
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, axis_names)


_DEFAULT_MESH: Optional[Mesh] = None


def set_default_mesh(mesh: Optional[Mesh]) -> None:
    global _DEFAULT_MESH
    _DEFAULT_MESH = mesh


def get_default_mesh() -> Mesh:
    """Return the process-wide default mesh, creating a pure-DP one lazily."""
    global _DEFAULT_MESH
    if _DEFAULT_MESH is None:
        _DEFAULT_MESH = create_mesh(MeshConfig(data=-1, model=1))
    return _DEFAULT_MESH
