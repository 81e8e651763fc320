"""Profiling/observability helpers (SURVEY §5.1: absent in the reference).

- ``trace``: context manager around jax.profiler for TensorBoard-viewable
  device traces.
- ``StepTimer``: cheap wall-clock per-step timing with examples/sec, the
  north-star throughput metric.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a device trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, examples_per_step: int, log_every: int = 100):
        self.examples_per_step = examples_per_step
        self.log_every = log_every
        self._t0: Optional[float] = None
        self._steps = 0

    def step(self) -> Optional[float]:
        """Call once per step; returns examples/sec at log boundaries."""
        if self._t0 is None:
            self._t0 = time.perf_counter()
        self._steps += 1
        if self._steps % self.log_every == 0:
            elapsed = time.perf_counter() - self._t0
            return self._steps * self.examples_per_step / elapsed
        return None
