#!/usr/bin/env python
"""Run the on-TPU kernel oracle suite (tests/tpu) against the real chip.

One command that fails loudly on any Mosaic kernel/numerics regression:

    python tools/tpu_kernel_check.py

It simply execs pytest over tests/tpu with DRT_TEST_PLATFORM=tpu, which
lifts the CPU pin in tests/conftest.py. bench.py also runs a small-shape
subset of the same oracles before timing, so the driver's bench rc catches
regressions each round even if this tool isn't invoked.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

if __name__ == "__main__":
    env = dict(os.environ, DRT_TEST_PLATFORM="tpu")
    sys.exit(
        subprocess.call(
            [sys.executable, "-m", "pytest", "tests/tpu", "-q", *sys.argv[1:]],
            env=env,
            cwd=REPO,
        )
    )
