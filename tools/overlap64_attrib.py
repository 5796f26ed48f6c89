"""Buffer-64 low-latency floor: attribute it, then attack it.

VERDICT r4 next #5: at bufferSize 64 (1.333 ms deadline,
cuda/globals.cu:55 basis) the r4 overlapped campaign left compute
workloads at 1.6-2.2 ms/block through the relay without attributing
the residual. This campaign decomposes the overlapped per-block cost
into its mechanisms and then tries the two levers the attribution
suggests:

Components measured per workload (all at the same shapes, same
session):
* ``upload_only``  -- device_put per block, ONE sync at the end: the
  per-block H2D enqueue cost (on a relay, an RPC each).
* ``dispatch_only`` -- compute per block on a RESIDENT input, one
  sync: the per-block execute-enqueue cost.
* ``overlapped``   -- the r4 tier (upload k+1 while k computes).
* ``overlapped_deep`` -- same at 4x the depth (does the floor
  amortize further?).
* ``batched_B``    -- B blocks per upload RPC
  (harness/overlap.measure_overlap_batched): cuts upload dispatches
  by B at the cost of B blocks of producer-side input buffering --
  the report labels that latency trade explicitly.

Verdict per workload: the best measured per-block time vs the
1.333 ms deadline, plus which component dominates the residual.

Outputs docs/RESULTS_r5_overlap64.json + .md.

Usage: python tools/overlap64_attrib.py [out_base] [--reps 5]
"""

from __future__ import annotations

import _pathfix  # noqa: F401,E402 - repo-root sys.path (tools/_pathfix.py)

import argparse
import json
import os
import time

WORKLOADS = ["gain", "IIRFilter", "Conv1D", "DAWSessionMix"]
DEPTH = 64
DEEP_DEPTH = 256
BATCHES = (8, 32)


def _measure_components(name: str, reps: int) -> dict:
    import numpy as np

    from gpuaudiobench_tpu.config import BenchConfig
    from gpuaudiobench_tpu.harness.overlap import (
        _probe_slice,
        measure_overlap,
        measure_overlap_batched,
    )
    from gpuaudiobench_tpu.harness.statistics import calculate_statistics
    from gpuaudiobench_tpu.registry import create_benchmark
    from gpuaudiobench_tpu.utils import device as dev

    cfg = BenchConfig(buffer_size=64, n_runs=2, warmup=2,
                      verification="spot", write_latencies=False,
                      device_timing=False, quiet=True)
    b = create_benchmark(name, cfg)
    b.setup()
    ob = b.overlap_body()
    if ob is None:
        return {"benchmark": name, "skipped": "no overlap_body"}
    step_fn, host_blocks, carry = ob
    host_blocks = list(host_blocks)
    nh = len(host_blocks)

    rec = {"benchmark": name, "buffer_size": 64, "depth": DEPTH,
           "deadline_ms": cfg.deadline_ms()}

    def p50(vals):
        return calculate_statistics(vals).median

    # -- upload_only: enqueue H2D per block, one trailing sync --------
    xd = dev.to_device(host_blocks[0])
    _ = np.asarray(np.asarray(xd)[:1])  # warm the D2H path
    vals = []
    for _ in range(reps):
        t0 = time.perf_counter()
        last = None
        for k in range(DEPTH):
            last = dev.to_device(host_blocks[k % nh])
        np.asarray(_probe_slice(last))
        vals.append((time.perf_counter() - t0) / DEPTH * 1000.0)
    rec["upload_only_ms"] = p50(vals)

    # -- dispatch_only: compute per block on resident input, one sync -
    xd = dev.to_device(host_blocks[0])
    c = carry
    y, c = step_fn(xd, c)
    _ = np.asarray(_probe_slice(y))
    vals = []
    for _ in range(reps):
        t0 = time.perf_counter()
        last = None
        for _k in range(DEPTH):
            y, c = step_fn(xd, c)
            last = y
        np.asarray(_probe_slice(last))
        vals.append((time.perf_counter() - t0) / DEPTH * 1000.0)
    rec["dispatch_only_ms"] = p50(vals)

    # -- overlapped at depth 64 and 4x depth --------------------------
    ser, ovl = measure_overlap(step_fn, host_blocks, carry, DEPTH, reps)
    rec["serial_ms"] = p50(ser)
    rec["overlapped_ms"] = p50(ovl)
    _, ovl_deep = measure_overlap(step_fn, host_blocks, carry,
                                  DEEP_DEPTH, max(3, reps // 2))
    rec["overlapped_deep_ms"] = p50(ovl_deep)
    rec["deep_depth"] = DEEP_DEPTH

    # -- batched uploads ----------------------------------------------
    for batch in BATCHES:
        try:
            vals = measure_overlap_batched(
                step_fn, host_blocks, carry, DEEP_DEPTH, batch,
                max(3, reps // 2))
            rec[f"batched_{batch}_ms"] = p50(vals)
        except Exception as e:  # noqa: BLE001 - record, keep going
            rec[f"batched_{batch}_ms"] = None
            rec[f"batched_{batch}_error"] = f"{type(e).__name__}: {e}"

    best_key = min(
        (k for k in rec if k.endswith("_ms")
         and k not in ("upload_only_ms", "dispatch_only_ms",
                       "serial_ms")
         and rec[k] is not None),
        key=lambda k: rec[k])
    rec["best_ms"] = rec[best_key]
    rec["best_tier"] = best_key[:-3]
    rec["meets_deadline_64"] = bool(rec["best_ms"] <= cfg.deadline_ms())
    return rec


def render_md(rows, reps) -> str:
    lines = [
        "# Buffer-64 low-latency floor: attribution + batched-upload "
        "attack (relay rig)",
        "",
        "Deadline 1.333 ms (64 samples @ 48 kHz, cuda/globals.cu:55 "
        "basis). Components per workload: upload_only = per-block "
        "device_put enqueue (one trailing sync); dispatch_only = "
        "per-block compute enqueue on resident input; overlapped = "
        "upload k+1 while k computes (r4 tier) at depth 64 and 256; "
        "batched_B = B blocks per upload RPC "
        "(harness/overlap.measure_overlap_batched) -- NOTE: batching "
        "adds B blocks of producer-side input latency; it buys "
        "throughput under the deadline, not end-to-end latency.",
        "",
        "| Workload | upload only | dispatch only | serial | "
        "overlapped@64 | overlapped@256 | batched@8 | batched@32 | "
        "best (tier) | meets 1.333? |",
        "|---|---:|---:|---:|---:|---:|---:|---:|---:|---|",
    ]
    for r in rows:
        if r.get("skipped"):
            lines.append(f"| {r['benchmark']} | skipped: "
                         f"{r['skipped']} | | | | | | | | |")
            continue
        f = lambda k: (f"{r[k]:.3f}" if r.get(k) is not None else "—")  # noqa: E731
        lines.append(
            f"| {r['benchmark']} | {f('upload_only_ms')} | "
            f"{f('dispatch_only_ms')} | {f('serial_ms')} | "
            f"{f('overlapped_ms')} | {f('overlapped_deep_ms')} | "
            f"{f('batched_8_ms')} | {f('batched_32_ms')} | "
            f"{r['best_ms']:.3f} ({r['best_tier']}) | "
            f"{'YES' if r['meets_deadline_64'] else 'no'} |")
    lines += [
        "",
        "Reading: if upload_only ~ overlapped, the floor is the "
        "per-upload RPC and batching is the lever; if dispatch_only "
        "dominates, it is the per-execute RPC and deeper pipelining "
        "cannot help (each block is still one execute enqueue). "
        f"reps={reps}; tools/overlap64_attrib.py.",
    ]
    return "\n".join(lines) + "\n"


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("out", nargs="?",
                    default=os.path.join(os.path.dirname(__file__), "..",
                                         "docs", "RESULTS_r5_overlap64"))
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--workloads", default=",".join(WORKLOADS))
    args = ap.parse_args(argv)

    rows = []
    for name in args.workloads.split(","):
        print(f"overlap64: {name} ...", flush=True)
        try:
            rec = _measure_components(name, args.reps)
        except Exception as e:  # noqa: BLE001
            rec = {"benchmark": name,
                   "skipped": f"{type(e).__name__}: {e}"}
        rows.append(rec)
        print(f"  -> {json.dumps(rec)[:240]}", flush=True)

    with open(args.out + ".json", "w") as f:
        json.dump({"reps": args.reps, "rows": rows}, f, indent=2)
    with open(args.out + ".md", "w") as f:
        f.write(render_md(rows, args.reps))
    print(f"written: {args.out}.json / .md")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
