"""Flash-attention backward: step time + peak memory vs dense SDPA.

Pins the VERDICT round-2 #3 "before/after" row for BASELINE.md. "Before"
is the round-1 formulation: the backward differentiates the dense SDPA
(materializing the (S, S) score matrix); "after" is the blockwise Pallas
backward (ops/attention._flash_backward_impl) that rebuilds p per block
from the saved log-sum-exp.

Measures a full fwd+bwd (value_and_grad of a scalar loss over q/k/v) on one
chip, causal, with a 10%-padding key mask — the Transformer training shape.

Run on the TPU: ``python benchmarks/attention_bwd.py [--seq 1024]``
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.trace_timing import fence  # noqa: E402

import jax
import jax.numpy as jnp
import numpy as np

from deep_recommenders_tpu.ops.attention import (
    flash_attention_diff,
    scaled_dot_product_attention,
)


def bench(fn, args, iters=50):
    out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / iters * 1e3


def peak_bytes(fn, args):
    try:
        m = jax.jit(fn).lower(*args).compile().memory_analysis()
        return int(m.temp_size_in_bytes)
    except Exception:
        return None


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bh", type=int, default=64)  # batch * heads
    p.add_argument("--seq", type=int, default=1024)
    p.add_argument("--dim", type=int, default=64)
    args = p.parse_args()

    rng = np.random.default_rng(0)
    shape = (args.bh, args.seq, args.dim)
    q = jnp.asarray(rng.normal(0, 1, shape).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 1, shape).astype(np.float32))
    v = jnp.asarray(rng.normal(0, 1, shape).astype(np.float32))
    mask = jnp.asarray(
        (rng.random((args.bh, args.seq)) < 0.9).astype(np.float32)
    )

    @jax.jit
    def dense_step(q, k, v):
        def loss(q, k, v):
            o = scaled_dot_product_attention(
                q, k, v, key_mask=mask, causal=True
            )
            return jnp.sum(o * o)

        return jax.value_and_grad(loss, argnums=(0, 1, 2))(q, k, v)

    @jax.jit
    def flash_step(q, k, v):
        def loss(q, k, v):
            o = flash_attention_diff(q, k, v, mask, True)
            return jnp.sum(o * o)

        return jax.value_and_grad(loss, argnums=(0, 1, 2))(q, k, v)

    dense_ms = bench(dense_step, (q, k, v))
    flash_ms = bench(flash_step, (q, k, v))
    print(
        json.dumps(
            {
                "shape": list(shape),
                "dense_fwd_bwd_ms": round(dense_ms, 3),
                "flash_fwd_bwd_ms": round(flash_ms, 3),
                "speedup": round(dense_ms / flash_ms, 2),
                "dense_temp_bytes": peak_bytes(
                    lambda q, k, v: dense_step(q, k, v), (q, k, v)
                ),
                "flash_temp_bytes": peak_bytes(
                    lambda q, k, v: flash_step(q, k, v), (q, k, v)
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
