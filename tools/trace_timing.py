"""Device-time measurement via jax.profiler traces (wall time lies through
the remote-dispatch tunnel: ~5ms fixed per dispatch)."""
import glob
import shutil
import time

import jax
import jax.numpy as jnp
import numpy as np

from tensorflow.tsl.profiler.protobuf import xplane_pb2

_DIR = "/tmp/jax_trace_util"

# Fixed tunnel latency allowance for the wall-clock self-check below: one
# dispatch + one value fetch through the remote-dispatch backend (measured
# ~28 ms in bench.py; 100 ms is a safe ceiling that still catches a trace
# that truncated a multi-hundred-ms region).
_TUNNEL_ALLOWANCE_S = 0.100


def fence(out):
    """Fetch one element derived from ``out`` — the only reliable fence
    through the remote-dispatch tunnel. ``jax.block_until_ready`` can
    return before the device finishes (bench.py commit 207f7a5,
    trainer.py); a value fetch cannot, because the bytes must exist.
    Public: every wall-timing tool in benchmarks/ should use this."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0:1])


_fence = fence  # internal alias


def _parse_memory_breakdown(raw):
    """Hand-parse the profiler's ``memory_access_breakdown`` stat (the
    op_metrics proto is not shipped in this wheel): repeated messages of
    {1: operation_type, 2: memory_space, 3: bytes_accessed} varints."""
    out = []
    i = 0

    def varint(i):
        v, s = 0, 0
        while True:
            b = raw[i]
            i += 1
            v |= (b & 0x7F) << s
            if not b & 0x80:
                return v, i
            s += 7

    while i < len(raw):
        tag, i = varint(i)
        if tag != 0x0A:  # unexpected layout: bail rather than mis-sum
            return out
        ln, i = varint(i)
        end = i + ln
        entry = {}
        while i < end:
            t, i = varint(i)
            v, i = varint(i)
            entry[t >> 3] = v
        out.append(entry)
    return out


# Memory-space id in the breakdown entries that denotes HBM on this
# backend. Calibrated empirically (round 5): a 16x(64 MB read + 64 MB
# write) streaming loop reports 2.35 GB in space 3 (theoretical 2.05 GB,
# +15% scheduler extras) and ~0.3 GB in space 1 (the S(1)/VMEM alternate
# space used for prefetched operands).
HBM_SPACE = 3


def device_us_per_step(
    step_fn, n_steps=64, carry0=None, top=0, cost=False, hbm=False
):
    """Scan step_fn (carry, None) -> (carry, None|aux) n_steps times on
    device, trace it, return total device-plane µs / n_steps.

    With ``cost=True`` returns (us, flops_per_step, bytes_per_step) from
    XLA's cost analysis of the compiled scan — the roofline numerator/
    denominator for MFU and HBM-utilization context. NOTE that cost
    analysis counts LOGICAL buffer accesses (fusion-internal reuse double
    counts), so that bytes column is an upper bound that can exceed the
    physical HBM peak. ``hbm=True`` appends a fourth element:
    HBM-attributed bytes/step summed from the profiler's per-op
    memory_access_breakdown (space filter calibrated above) — compiler-
    attributed PHYSICAL traffic, the number to compare against peak
    bandwidth."""
    if carry0 is None:
        carry0 = jnp.zeros((), jnp.int32)
    f = jax.jit(lambda c: jax.lax.scan(step_fn, c, None, length=n_steps))
    out = f(carry0)
    _fence(out)
    flops = bytes_ = 0.0
    if cost:
        # XLA's cost_analysis() of a compiled lax.scan reports flops/bytes
        # for ONE while-loop body iteration, NOT n_steps of them (verified
        # empirically: a 64-step scan of a 128x128 matmul reports ~one
        # matmul's flops). So the numbers below are already per-step — do
        # not divide by n_steps (ADVICE r3: dividing made MFU ~64x too low).
        try:
            ca = f.lower(carry0).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            flops = float(ca.get("flops", 0.0))
            bytes_ = float(ca.get("bytes accessed", 0.0))
        except Exception as e:  # noqa: BLE001 — visible, not silent
            import sys

            print(f"WARNING: cost_analysis failed ({e!r}); "
                  "flops/bytes reported as 0", file=sys.stderr)
    shutil.rmtree(_DIR, ignore_errors=True)
    with jax.profiler.trace(_DIR):
        t0 = time.perf_counter()  # after session start: exclude its cost
        out = f(carry0)
        _fence(out)  # inside the trace: region must not close early
        wall_s = time.perf_counter() - t0
    files = glob.glob(f"{_DIR}/**/*.xplane.pb", recursive=True)
    total = 0.0
    rows = {}
    hbm_bytes = 0
    for fp in files:
        xs = xplane_pb2.XSpace()
        xs.ParseFromString(open(fp, "rb").read())
        for plane in xs.planes:
            if "TPU" not in plane.name:
                continue
            ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
            md_hbm = {}
            if hbm:
                smeta = {
                    m.id: m.name for m in plane.stat_metadata.values()
                }
                for m in plane.event_metadata.values():
                    for st in m.stats:
                        if smeta.get(st.metadata_id) == (
                            "memory_access_breakdown"
                        ):
                            md_hbm[m.id] = sum(
                                e.get(3, 0)
                                for e in _parse_memory_breakdown(
                                    st.bytes_value
                                )
                                if e.get(2) == HBM_SPACE
                            )
            for line in plane.lines:
                if hbm and line.name == "XLA Ops":
                    for ev in line.events:
                        # Async pairs (copy-start/copy-done etc.) carry
                        # the SAME bytes on both halves — count starts
                        # only, or every prefetch doubles.
                        name = ev_meta.get(ev.metadata_id, "")
                        if "-done" in name.split(" = ")[0]:
                            continue
                        hbm_bytes += md_hbm.get(ev.metadata_id, 0)
                if line.name != "XLA Modules":
                    # avoid double counting: module-level line only
                    continue
                for ev in line.events:
                    name = ev_meta.get(ev.metadata_id, "?")
                    rows[name] = rows.get(name, 0) + ev.duration_ps / 1e6
    total = sum(rows.values())
    # Self-check (VERDICT r4 #2): the fenced wall time minus the tunnel
    # allowance is a LOWER bound on device busy time. If the trace captured
    # less than that, it truncated (events lost / region closed early) and
    # device_us_per_step would silently under-report.
    wall_floor_us = (wall_s - _TUNNEL_ALLOWANCE_S) * 1e6
    if total < wall_floor_us:
        raise RuntimeError(
            f"trace captured {total:.0f} us but the value-fenced wall time "
            f"implies >= {wall_floor_us:.0f} us of device work — the trace "
            "truncated; rerun (do not trust this number)"
        )
    if top:
        for k, v in sorted(rows.items(), key=lambda kv: -kv[1])[:top]:
            print(f"    {v/n_steps:9.2f} us/step  {k[:100]}")
    us = total / n_steps
    if cost and hbm:
        return us, flops, bytes_, hbm_bytes / n_steps
    if cost:
        return us, flops, bytes_
    if hbm:
        return us, hbm_bytes / n_steps
    return us


def device_op_breakdown(step_fn, n_steps=64, carry0=None, top=20):
    """Like device_us_per_step but returns per-op totals from XLA Ops line."""
    if carry0 is None:
        carry0 = jnp.zeros((), jnp.int32)
    f = jax.jit(lambda c: jax.lax.scan(step_fn, c, None, length=n_steps))
    out = f(carry0)
    _fence(out)
    shutil.rmtree(_DIR, ignore_errors=True)
    with jax.profiler.trace(_DIR):
        out = f(carry0)
        _fence(out)  # inside the trace: region must not close early
    files = glob.glob(f"{_DIR}/**/*.xplane.pb", recursive=True)
    rows = {}
    for fp in files:
        xs = xplane_pb2.XSpace()
        xs.ParseFromString(open(fp, "rb").read())
        for plane in xs.planes:
            if "TPU" not in plane.name:
                continue
            ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                if "XLA Ops" not in line.name:
                    continue
                for ev in line.events:
                    name = ev_meta.get(ev.metadata_id, "?")
                    key = name.split(" = ")[0] if " = " in name else name
                    rows[key] = rows.get(key, 0) + ev.duration_ps / 1e6
    for k, v in sorted(rows.items(), key=lambda kv: -kv[1])[:top]:
        print(f"    {v/n_steps:9.2f} us/step  {k[:110]}")
    return rows


def device_source_breakdown(step_fn, n_steps=16, carry0=None, top=25):
    """Attribute device time to PYTHON SOURCE LINES.

    Compiles the scanned step, parses the compiled HLO's per-op metadata
    (source_file:source_line), then aggregates the profiler trace's XLA-Ops
    durations by source location. Where an op breakdown says "fusion.122",
    this says "models/nlp/attention.py:117" — the view that tells you which
    MODEL line to optimize. Async -start/-done pairs are counted once.
    """
    import re

    if carry0 is None:
        carry0 = jnp.zeros((), jnp.int32)
    f = jax.jit(lambda c: jax.lax.scan(step_fn, c, None, length=n_steps))
    hlo = f.lower(carry0).compile().as_text()
    src_of = {}
    pat = re.compile(
        r"%([\w.\-]+) = .*?source_file=\"([^\"]+)\" source_line=(\d+)"
    )
    for m in pat.finditer(hlo):
        src_of[m.group(1)] = f"{m.group(2).split('/')[-1]}:{m.group(3)}"
    out = f(carry0)
    _fence(out)
    shutil.rmtree(_DIR, ignore_errors=True)
    with jax.profiler.trace(_DIR):
        out = f(carry0)
        _fence(out)
    rows = {}
    for fp in glob.glob(f"{_DIR}/**/*.xplane.pb", recursive=True):
        xs = xplane_pb2.XSpace()
        xs.ParseFromString(open(fp, "rb").read())
        for plane in xs.planes:
            if "TPU" not in plane.name:
                continue
            ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                if "XLA Ops" not in line.name:
                    continue
                for ev in line.events:
                    name = ev_meta.get(ev.metadata_id, "?")
                    op = name.split(" = ")[0].lstrip("%")
                    if "-done" in op:
                        continue
                    key = src_of.get(op, f"<no-source:{op.split('.')[0]}>")
                    rows[key] = rows.get(key, 0) + ev.duration_ps / 1e6
    for k, v in sorted(rows.items(), key=lambda kv: -kv[1])[:top]:
        print(f"    {v/n_steps:9.1f} us/step  {k}")
    return rows
