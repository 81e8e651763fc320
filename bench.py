"""Benchmark: DeepFM training throughput on MovieLens-scale data, per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md) and is a single-process CPU
TF library, so the baseline here is self-referential: the first TPU run
writes its result to BENCH_BASELINE.json and later rounds report the ratio
against that pinned first-run value (>1.0 = faster than round-1).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_PATH = os.path.join(REPO, "BENCH_BASELINE.json")

# Persistent XLA/Mosaic compilation cache: the round-3 bench timed out
# (BENCH_r03.json rc=124) because the in-bench Pallas oracle compiles spent
# minutes of Mosaic compile time before the timed section on every run.
# With the cache, any warm run (including the driver capture after this
# script has run once on the host) reuses the compiled executables.
_CACHE_DIR = os.path.join(REPO, ".cache", "jax")
os.makedirs(_CACHE_DIR, exist_ok=True)
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# Hard wall-clock budget for the pre-bench kernel oracles; past it we skip
# the remaining oracles with a stderr warning instead of eating the driver
# window (VERDICT r3 Weak #1 / Next #1).
ORACLE_BUDGET_S = float(os.environ.get("BENCH_ORACLE_BUDGET_S", "150"))

BATCH = 8192
EMBED_DIM = 16
HIDDEN = (256, 32)
# Steps fused into one device-resident lax.scan. At ~176us device time per
# step the measurement overheads through the remote-dispatch tunnel are
# large relative to short windows: a value fetch costs ~28ms and the
# original 512-step total left it (plus dispatch sends) as ~25-45% of the
# "measured" time. 4096 total steps (~0.7s of device compute) amortize the
# single end-of-run fetch below 4%; compile time stays flat (scan traces
# the body once regardless of length).
SCAN_STEPS = 512
SCAN_REPEATS = 8


def verify_kernels():
    """Small-shape Pallas-kernel oracle asserts on the bench chip.

    A fast subset of tests/tpu/test_kernel_oracles.py wired into the
    driver-run bench so a Mosaic lowering/numerics regression fails the
    round's bench rc loudly instead of shipping a wrong kernel (VERDICT r2
    Missing #4). No-op off TPU.

    Time-boxed (ORACLE_BUDGET_S): cheap oracles run first; the expensive
    flash-attention fwd+bwd compile runs only if budget remains. Past the
    budget we warn on stderr and continue to the timed bench — a bench that
    times out ships no perf number at all (round-3 failure mode).
    """
    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        return "skipped"
    t_start = time.perf_counter()
    rng = np.random.default_rng(0)

    def oracle_fm():
        from deep_recommenders_tpu.ops.fm import (
            fm_interaction,
            fm_interaction_pallas,
        )

        emb = jnp.asarray(rng.normal(0, 1, (512, 6, 16)).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(fm_interaction_pallas(emb)),
            np.asarray(fm_interaction(emb)), rtol=1e-5, atol=1e-4,
        )

    def oracle_scatter():
        from deep_recommenders_tpu.ops.embedding_kernels import (
            factored_scatter_add,
        )

        gsc = jnp.asarray(rng.normal(0, 1, (4096, 16)).astype(np.float32))
        ids = jnp.asarray(rng.integers(0, 500, 4096).astype(np.int32))
        sref = jnp.zeros((500, 16), jnp.float32).at[ids].add(
            gsc.astype(jnp.bfloat16).astype(jnp.float32)
        )
        np.testing.assert_allclose(
            np.asarray(factored_scatter_add(gsc, ids, 500)),
            np.asarray(sref), atol=1e-3, rtol=1e-3,
        )

    def oracle_cin():
        from deep_recommenders_tpu.ops.cin_kernels import (
            _cin2d_reference,
            _stack_reference,
            cin2d,
            cin_stack_pooled,
        )

        x0v = jnp.asarray(rng.normal(0, 1, (512, 6)).astype(np.float32))
        xv = jnp.asarray(rng.normal(0, 1, (512, 64)).astype(np.float32))
        w = jnp.asarray(rng.normal(0, 0.2, (6, 64, 128)).astype(np.float32))
        cref = np.asarray(_cin2d_reference(x0v, xv, w))
        scale = float(np.abs(cref).max())
        np.testing.assert_allclose(np.asarray(cin2d(x0v, xv, w)), cref,
                                   atol=2e-2 * scale, rtol=2e-2)
        # Fused 2-layer stack (the xDeepFM flagship path, round 5).
        xs = x0v.astype(jnp.bfloat16)
        w1 = jnp.asarray(rng.normal(0, 0.2, (6, 6, 128)).astype(np.float32))
        w2 = jnp.asarray(
            rng.normal(0, 0.2, (6, 128, 128)).astype(np.float32)
        )
        pk = cin_stack_pooled(xs, w1, w2, 16)
        pr = _stack_reference(xs, w1, w2, 16)
        for a, r in zip(pk, pr):
            s = float(np.abs(np.asarray(r)).max())
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(r), atol=1e-2 * s, rtol=1e-2
            )

    def oracle_flash():
        from deep_recommenders_tpu.ops.attention import (
            flash_attention_diff,
            scaled_dot_product_attention,
        )

        q = jnp.asarray(rng.normal(0, 1, (2, 256, 64)).astype(np.float32))
        kv = jnp.asarray(rng.normal(0, 1, (2, 256, 64)).astype(np.float32))
        mask = jnp.ones((2, 256), jnp.float32)
        ct = jnp.asarray(rng.normal(0, 1, (2, 256, 64)).astype(np.float32))

        # ONE jitted program with flash fwd+grad and reference fwd+grad —
        # a single compile instead of four separate dispatches.
        @jax.jit
        def both(q):
            f, fg = jax.value_and_grad(
                lambda a: jnp.sum(
                    flash_attention_diff(a, kv, kv, mask, True) * ct
                )
            )(q)
            r, rg = jax.value_and_grad(
                lambda a: jnp.sum(
                    scaled_dot_product_attention(
                        a, kv, kv, key_mask=mask, causal=True
                    ) * ct
                )
            )(q)
            return f, fg, r, rg

        f, fg, r, rg = both(q)
        # The scalar is a sum of ~32k zero-mean products: cancellation
        # makes its RELATIVE error noisy (measured up to ~0.7% on benign
        # draws), so bound it loosely; the per-element gradient check
        # below is the real numerics oracle.
        np.testing.assert_allclose(np.asarray(f), np.asarray(r),
                                   rtol=5e-2, atol=5e-2)
        np.testing.assert_allclose(np.asarray(fg), np.asarray(rg),
                                   rtol=1e-2, atol=1e-2)

    # Cheapest compile first; check the remaining budget before EACH oracle
    # (measured on this host via the axon tunnel: Mosaic compiles are not
    # captured by the persistent cache, so every run pays them — the budget
    # must bound each step, not just the expensive tail).
    for name, fn in (
        ("fm", oracle_fm),
        ("scatter", oracle_scatter),
        ("cin", oracle_cin),
        ("flash", oracle_flash),
    ):
        spent = time.perf_counter() - t_start
        if spent > ORACLE_BUDGET_S:
            print(
                f"WARNING: skipping kernel oracle '{name}' (+rest) — budget "
                f"{ORACLE_BUDGET_S:.0f}s exhausted after {spent:.0f}s; run "
                f"DRT_TEST_PLATFORM=tpu pytest tests/tpu for full coverage",
                file=sys.stderr,
            )
            return "skipped"
        fn()
        # stderr: the driver parses stdout's single JSON line
        print(
            f"kernel oracle {name}: ok "
            f"[t={time.perf_counter() - t_start:.0f}s]",
            file=sys.stderr,
        )
    return "ok"


def main():
    import jax
    import optax

    from deep_recommenders_tpu.features import Feature
    from deep_recommenders_tpu.models.ranking import DeepFM
    from deep_recommenders_tpu.training import Trainer

    specs = (
        Feature("user_id", hash_buckets=6040),
        Feature("user_gender", vocab=("F", "M")),
        Feature("user_age", vocab=(1, 18, 25, 35, 45, 50, 56)),
        Feature("user_occupation", vocab=tuple(range(21))),
        Feature("movie_id", hash_buckets=3952),
        Feature("movie_genres", vocab=tuple(range(18)), max_len=6),
    )
    rng = np.random.default_rng(0)
    n = BATCH * 4  # a few distinct device-resident batches
    data = {
        "user_id": rng.integers(0, 6040, n).astype(np.int32),
        "user_gender": rng.integers(0, 2, n).astype(np.int32),
        "user_age": rng.integers(0, 7, n).astype(np.int32),
        "user_occupation": rng.integers(0, 21, n).astype(np.int32),
        "movie_id": rng.integers(0, 3952, n).astype(np.int32),
        "movie_genres": rng.integers(0, 18, (n, 6)).astype(np.int32),
        "movie_genres__wt": (rng.random((n, 6)) < 0.5).astype(np.float32),
    }
    labels = (rng.random((n, 1)) < 0.5).astype(np.float32)

    model = DeepFM(specs, embedding_dim=EMBED_DIM, hidden=HIDDEN)
    trainer = Trainer(model, optax.adam(1e-3), seed=0)

    # Device-resident step loop: stack 4 distinct batches, lax.scan the train
    # step over SCAN_STEPS (cycling through them). Measures the compute path
    # without per-step Python/tunnel dispatch, which at ~100us steps would
    # otherwise dominate and add 30%+ run-to-run noise.
    stacked = {
        k: jax.device_put(
            np.stack([v[i * BATCH : (i + 1) * BATCH] for i in range(4)])
        )
        for k, v in data.items()
    }
    stacked_labels = jax.device_put(
        np.stack([labels[i * BATCH : (i + 1) * BATCH] for i in range(4)])
    )
    first = {k: v[0] for k, v in stacked.items()}
    state = trainer.init(first)

    train_step = trainer.train_step_fn  # unjitted; scan traces it inline

    def scan_body(state, i):
        batch = {k: v[i % 4] for k, v in stacked.items()}
        state, loss = train_step(state, batch, stacked_labels[i % 4])
        return state, loss

    @jax.jit
    def run_scan(state):
        import jax.numpy as jnp

        return jax.lax.scan(
            scan_body, state, jnp.arange(SCAN_STEPS)
        )

    state, losses = run_scan(state)  # compile + warmup
    float(jax.numpy.sum(losses))  # value fetch: the only reliable fence
    # through the remote-dispatch tunnel (block_until_ready may not wait)

    # One timed region: the SCAN_REPEATS dispatches queue asynchronously on
    # the device, ONE value fetch at the end fences the region. The fetch's
    # ~28ms tunnel latency is <4% of the ~0.7s of device compute.
    t0 = time.perf_counter()
    for _ in range(SCAN_REPEATS):
        state, losses = run_scan(state)
    float(jax.numpy.sum(losses))
    elapsed = time.perf_counter() - t0
    n_chips = max(1, jax.device_count())
    total_steps = SCAN_STEPS * SCAN_REPEATS
    examples_per_sec_chip = total_steps * BATCH / elapsed / n_chips

    baseline = None
    if os.path.exists(BASELINE_PATH):
        try:
            with open(BASELINE_PATH) as f:
                baseline = json.load(f).get("examples_per_sec_per_chip")
        except (OSError, json.JSONDecodeError):
            baseline = None
    if not baseline:
        with open(BASELINE_PATH, "w") as f:
            json.dump(
                {
                    "examples_per_sec_per_chip": examples_per_sec_chip,
                    "config": {
                        "model": "DeepFM",
                        "batch": BATCH,
                        "embed_dim": EMBED_DIM,
                        "hidden": list(HIDDEN),
                        "backend": jax.default_backend(),
                    },
                },
                f,
                indent=2,
            )
        baseline = examples_per_sec_chip

    payload = {
        "metric": "deepfm_train_examples_per_sec_per_chip",
        "value": round(examples_per_sec_chip, 1),
        "unit": "examples/sec/chip",
        "vs_baseline": round(examples_per_sec_chip / baseline, 3),
        "oracles": "pending",
    }
    # Crash insurance: this first line guarantees a perf artifact even if an
    # oracle compile hangs past the driver window (round-3 failure mode:
    # rc=124, parsed=null). The LAST stdout JSON line is authoritative — it
    # carries the real oracle status (ADVICE r4: a perf number must not be
    # ingestible without its verification status).
    print(json.dumps(payload), flush=True)

    # Kernel oracles AFTER the timed section: a slow Mosaic compile can
    # never erase the perf number. An oracle FAILURE still fails the rc
    # AND is recorded in the final JSON line.
    try:
        payload["oracles"] = verify_kernels()
    except Exception:
        payload["oracles"] = "failed"
        print(json.dumps(payload), flush=True)
        raise
    print(json.dumps(payload), flush=True)


if __name__ == "__main__":
    main()
