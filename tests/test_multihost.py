"""Real multi-host data path: 2-process jax.distributed CPU training.

VERDICT round-2 #2: each process feeds only ITS slice of the global batch
(``shard_batch`` -> jax.make_array_from_process_local_data), gradients psum
across processes via gloo CPU collectives, and the run must reproduce the
single-process losses on the same global batches.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np

import multihost_worker as worker

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_training_matches_single_process(tmp_path):
    # Reference: single-process, full global batches, no mesh.
    ref_losses = worker.train_losses(mesh=None)

    port = _free_port()
    out_path = str(tmp_path / "losses.json")
    env = dict(os.environ)
    # One local CPU device per process -> a 2-device global ("data"=2) mesh.
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [
                sys.executable,
                os.path.join(REPO, "tests", "multihost_worker.py"),
                str(port),
                str(pid),
                out_path,
            ],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    outputs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outputs.append(out.decode(errors="replace"))
    for p, out in zip(procs, outputs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"

    with open(out_path) as f:
        dist_losses = json.load(f)
    np.testing.assert_allclose(dist_losses, ref_losses, rtol=2e-4, atol=1e-6)
    # The run actually trained (losses move), not a frozen graph.
    assert abs(dist_losses[-1] - dist_losses[0]) > 1e-4
