"""Multi-host initialization (SURVEY §5.8: absent in the reference).

On a TPU pod slice each host runs the same program; ``initialize()`` wires
them into one JAX process group so ``jax.devices()`` spans the slice and the
("data", "model") mesh extends across hosts (data parallel over DCN/ICI,
model axis kept within a host's ICI domain by the default mesh order).

On single-host setups this is a no-op, so examples/tests run unchanged.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when running multi-host; returns True if
    distributed mode is active.

    Arguments default from the standard env vars (JAX/TPU runtime sets them
    on Cloud TPU; COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID cover manual
    launches).
    """
    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    if num_processes is None:
        env = os.environ.get("NUM_PROCESSES")
        num_processes = int(env) if env else None
    if process_id is None:
        env = os.environ.get("PROCESS_ID")
        process_id = int(env) if env else None

    already_multi = jax.process_count() > 1
    if already_multi:
        return True
    if coordinator_address is None and num_processes is None:
        # Cloud TPU pod slices auto-detect via the TPU runtime.
        try:
            jax.distributed.initialize()
        except (ValueError, RuntimeError):
            return False
        return jax.process_count() > 1
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count() > 1
