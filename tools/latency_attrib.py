"""Latency attribution for unsaturated workloads (VERDICT r3 next #4).

The honest roofline now labels rows below 20% of every modeled wall
"latency-bound" (utils/roofline.py). This tool backs that label with a
MEASUREMENT for the worst offenders: sweep the workload-size knob,
measure the saturated per-block cost at each size, and fit

    sat_ms(size) = a + b * size

The intercept ``a`` is the size-independent fixed cost per block
(dispatch + scan/recurrence fixed overhead); ``b`` is the marginal
cost of actual work. A workload whose default-size block time is
mostly ``a`` is measured -- not just labeled -- as latency-bound, and
``a`` itself is the attribution (e.g. DWG1DNaive's per-sample
sequential grid steps).

Knob per workload:
* DWG1DNaive / IIRFilter: bufferSize (the sequential-step axis; more
  samples = more recurrence steps per block, same track parallelism).
* gain: nTracks (elementwise; more tracks = more lanes of real work).

Writes a markdown artifact. Usage:
    python tools/latency_attrib.py [out.md] [--depth 128] [--reps 7]
"""

from __future__ import annotations

import _pathfix  # noqa: F401,E402 - repo-root sys.path (tools/_pathfix.py)

import argparse
import os

SWEEPS = [
    # (benchmark, knob field, sweep values, default value)
    ("DWG1DNaive", "buffer_size", [64, 128, 256, 512, 1024], 512),
    ("IIRFilter", "buffer_size", [64, 128, 256, 512, 1024], 512),
    ("gain", "n_tracks", [128, 512, 2048, 8192, 32768], 128),
]


def fit_line(xs, ys):
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    b = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / \
        sum((x - mx) ** 2 for x in xs)
    a = my - b * mx
    return a, b


def measure(benchmark, field, values, depth, reps):
    from gpuaudiobench_tpu.config import BenchConfig
    from gpuaudiobench_tpu.harness.runner import run_benchmark
    from gpuaudiobench_tpu.registry import create_benchmark

    points = []
    for v in values:
        cfg = BenchConfig(
            n_runs=2, warmup=2, pipeline_depth=depth,
            saturated_reps=reps, verification="none",
            device_timing=False, write_latencies=False, quiet=True,
            **{field: v},
        )
        b = create_benchmark(benchmark, cfg)
        b.setup()
        r = run_benchmark(b, cfg, verbose=False)
        sat = r.saturated_statistics
        points.append((v, sat.median if sat else float("nan")))
        print(f"  {benchmark} {field}={v}: sat p50 "
              f"{points[-1][1]:.4f} ms/block", flush=True)
    return points


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("out", nargs="?",
                    default=os.path.join(os.path.dirname(__file__), "..",
                                         "docs",
                                         "RESULTS_r4_latency_attrib.md"))
    ap.add_argument("--depth", type=int, default=128)
    ap.add_argument("--reps", type=int, default=7)
    args = ap.parse_args(argv)

    lines = [
        "# Latency attribution: fixed vs marginal per-block cost "
        "(measured)",
        "",
        "For each unsaturated workload (roofline 'latency-bound'), the "
        "saturated per-block cost is measured across its size knob and "
        "fit as `sat_ms = a + b*size`: `a` = size-independent fixed "
        "cost (dispatch + recurrence-step overhead), `b` = marginal "
        "cost of work. The fixed share at the default size is the "
        "measured attribution behind the label "
        "(`tools/latency_attrib.py`, saturated tier, depth "
        f"{args.depth}, {args.reps} reps).",
        "",
        "| Benchmark | knob | fit a (fixed ms) | fit b (ms/unit) | "
        "default size | fixed share @ default | points |",
        "|---|---|---:|---:|---:|---:|---|",
    ]
    for bench, field, values, default in SWEEPS:
        print(f"sweep: {bench} over {field}", flush=True)
        pts = measure(bench, field, values, args.depth, args.reps)
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        a, b = fit_line(xs, ys)
        at_default = a + b * default
        share = 100.0 * a / at_default if at_default > 0 else float("nan")
        pts_s = "; ".join(f"{x}→{y:.4f}" for x, y in pts)
        lines.append(
            f"| {bench} | {field} | {a:.4f} | {b:.3e} | {default} | "
            f"{share:.0f}% | {pts_s} |"
        )
    lines += [
        "",
        "Reading: a fixed share near 100% means the block time is the "
        "per-block floor, not the modeled work -- the roofline's "
        "'latency' label quantified. A low fixed share with all walls "
        "<20% of peak instead points at per-unit inefficiency (e.g. "
        "short-row vector work below the lane width).",
    ]
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"written: {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
