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


import pathlib

_HERE = pathlib.Path(__file__).parent.resolve()


def pytest_collection_modifyitems(config, items):
    """Skip ONLY tests that live under tests/tpu when no TPU is present.

    This hook fires for every conftest on the collection path and receives
    ALL collected items — filtering by item path is mandatory, otherwise a
    whole-tree `pytest tests` run would mark the entire suite skipped
    (round-3 regression: "178 skipped in 7.49s").
    """
    if jax.default_backend() == "tpu":
        return
    skip = pytest.mark.skip(
        reason="requires a real TPU (run: DRT_TEST_PLATFORM=tpu pytest tests/tpu)"
    )
    for item in items:
        try:
            in_tpu_dir = _HERE in pathlib.Path(str(item.path)).resolve().parents
        except (OSError, ValueError):
            in_tpu_dir = False
        if in_tpu_dir:
            item.add_marker(skip)
