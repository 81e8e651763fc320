"""On-TPU kernel oracle suite (VERDICT round-2 "Next" #4).

Every test here asserts a real Mosaic-compiled Pallas kernel against its
pure-JAX oracle ON THE CHIP — the main suite pins jax to 8 virtual CPU
devices (tests/conftest.py), where the kernels run in interpret mode or take
their XLA fallbacks, so Mosaic lowering/numerics regressions are invisible
to it.

Run with:  DRT_TEST_PLATFORM=tpu python -m pytest tests/tpu -q
(or tools/tpu_kernel_check.py). Collection is skipped wholesale when no TPU
backend is present, so the suite is a no-op inside the CPU-pinned main run.
"""

import jax
import pytest


def pytest_collection_modifyitems(config, items):
    if jax.default_backend() == "tpu":
        return
    skip = pytest.mark.skip(
        reason="requires a real TPU (run: DRT_TEST_PLATFORM=tpu pytest tests/tpu)"
    )
    for item in items:
        item.add_marker(skip)
