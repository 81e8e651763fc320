"""Test env: force an 8-device virtual CPU platform.

This is the standard JAX answer to testing multi-device sharding without a
TPU pod (SURVEY §4): all sharding/mesh tests run on 8 virtual CPU devices;
the driver separately dry-runs the multi-chip path on its own mesh.

Note: this environment's sitecustomize imports jax and pins the "axon" TPU
platform at interpreter startup, so setting JAX_PLATFORMS here is too late —
we must override via jax.config AFTER import (backends initialize lazily, so
the XLA_FLAGS device-count flag still applies).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# DRT_TEST_PLATFORM=tpu lifts the CPU pin so tests/tpu/ (the on-chip kernel
# oracle suite) can run against the real Mosaic-compiled kernels; everything
# else still defaults to the 8-device virtual CPU platform.
if os.environ.get("DRT_TEST_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite's wall time is dominated by XLA
# compiles of the shard_map mesh-parity programs (20-45s each). Warm runs
# reuse them, which is what makes the one-command suite habitually runnable
# (VERDICT r3 Next #2).
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".cache", "jax-tests")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
