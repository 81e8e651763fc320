"""Device-resident training data: the tf.data replacement for corpora that
fit in HBM.

The reference streams every batch host->graph through tf.data each step
(SURVEY §3.1 hot loop #1). On this framework's target hardware that feed
pattern is the bottleneck: the encoded MovieLens-1M train split is ~70 MB of
int32 — trivial for HBM — while per-step host transfers cap throughput three
orders of magnitude below device compute. ``DeviceData`` uploads the encoded
split once; an epoch is then one jitted lax.scan over shuffled batch indices
(gathers on-device), with only the epoch-level permutation crossing the host
boundary.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class DeviceData:
    """Encoded features + labels resident on device.

    ``features`` is any pytree of row-aligned arrays — a feature dict
    (CTR models), a bare (N, d) array (MMoE's synthetic task), or a
    (query_dict, candidate_dict) tuple (two-tower) — so every model
    family rides the same Trainer.fit_device scan. ``labels`` may be a
    pytree too (multi-task) or carry candidate ids (two-tower's
    accidental-negative removal).
    """

    features: Any
    labels: Any
    batch_size: int
    mesh: object = None  # jax.sharding.Mesh when the split is mesh-global

    @classmethod
    def from_numpy(
        cls,
        features: Any,
        labels: Any,
        batch_size: int,
        sharding=None,
        mesh=None,
    ) -> "DeviceData":
        """Upload an encoded split.

        With ``mesh``: rows are sharded over the "data" axis and — on a
        multi-host run — each process passes only ITS slice of the global
        split (global rows = local rows x process_count); the arrays are
        assembled process-locally (SURVEY §5.8).
        """
        if mesh is not None:
            from jax.sharding import PartitionSpec as P

            from deep_recommenders_tpu.parallel.sharding import (
                DATA_AXIS,
                host_array,
            )

            def put(x):
                return host_array(
                    x, mesh, P(DATA_AXIS, *([None] * (x.ndim - 1)))
                )
        elif sharding is not None:
            def put(x):
                return jax.device_put(x, sharding)
        else:
            put = jax.device_put
        return cls(
            features=jax.tree.map(put, features),
            labels=jax.tree.map(put, labels),
            batch_size=batch_size,
            mesh=mesh,
        )

    @property
    def num_examples(self) -> int:
        leaves = jax.tree.leaves(self.labels) or jax.tree.leaves(
            self.features
        )
        return int(leaves[0].shape[0])

    @property
    def steps_per_epoch(self) -> int:
        return self.num_examples // self.batch_size

    def permutation(self, seed: Optional[int], epoch: int) -> jax.Array:
        """Epoch-shuffled row order (host RNG, device array).

        The numpy RNG is seeded identically on every process, so multi-host
        runs agree on the global row order without communicating; the perm
        is materialized as a replicated global array on the mesh.
        """
        n = self.steps_per_epoch * self.batch_size
        idx = np.arange(self.num_examples)
        if seed is not None:
            np.random.default_rng(seed + epoch).shuffle(idx)
        idx = idx[:n].astype(np.int32)
        if self.mesh is not None and jax.process_count() > 1:
            from deep_recommenders_tpu.parallel.sharding import (
                replicate_on_mesh,
            )

            return replicate_on_mesh(idx, self.mesh)
        return jnp.asarray(idx)

    def gather(self, rows: jax.Array):
        """Device-side batch materialization (jit-safe)."""
        return gather_rows(self.features, self.labels, rows)

    def arrays(self):
        """The (features, labels) pytree — pass this as an ARGUMENT to
        jitted epoch loops (closure-capturing it instead bakes the whole
        corpus into the HLO as literal constants: slow compiles, and the
        remote-compile tunnel rejects the request outright past ~500 MB)."""
        return self.features, self.labels


def gather_rows(features: Any, labels: Any, rows: jax.Array):
    """Batch-gather ``rows`` from row-aligned (features, labels) pytrees."""
    take = lambda v: jnp.take(v, rows, axis=0)  # noqa: E731
    return jax.tree.map(take, features), jax.tree.map(take, labels)
