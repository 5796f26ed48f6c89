"""RndMemRead track-count sweep: the DAFx-24 poster's tab6 analog.

Records saturated ms/block and on-device ms at 128/4096/16384/65536
tracks next to the published RTX 4070 / M2 Pro p50s, so the repo's tab6
comparison table regenerates from one shipped tool instead of ad-hoc
runs. Pipeline depth shrinks with track count to keep executable size
(and compile time) bounded; the depth used is recorded per row.

Usage: python tools/rndmem_sweep.py [output.md]
"""

from __future__ import annotations

import _pathfix  # noqa: F401,E402 - repo-root sys.path (tools/_pathfix.py)

import sys

# (tracks, pipeline depth, RTX 4070 p50 ms, M2 Pro p50 ms) --
# published numbers from BASELINE.md tab6.
POINTS = [
    (128, 256, 0.163, 0.657),
    (4096, 256, 1.030, 0.719),
    (16384, 64, 3.810, 0.924),
    (65536, 32, 19.297, 4.801),
]


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "docs/RESULTS_r3_rndmem.md"
    from gpuaudiobench_tpu.config import BenchConfig
    from gpuaudiobench_tpu.harness.runner import run_benchmark
    from gpuaudiobench_tpu.registry import create_benchmark

    lines = [
        "# RndMem track sweep (TPU v5e; tab6 analog, 512 MiB pool)",
        "",
        "Saturated ms/block from the --pipelineDepth streaming pass",
        "(playheads carried on-device); device ms is the xplane module",
        "time. Published p50s from BASELINE.md tab6.",
        "",
        "| Tracks | RTX 4070 p50 | M2 Pro p50 | TPU saturated (depth) | TPU device ms |",
        "|---:|---:|---:|---:|---:|",
    ]
    for tracks, depth, pc, as_ in POINTS:
        cfg = BenchConfig(
            n_tracks=tracks, n_runs=3, warmup=2, pipeline_depth=depth,
            saturated_reps=3, write_latencies=False,
            verification="spot",
        )
        b = create_benchmark("RndMemRead", cfg)
        b.setup()
        r = run_benchmark(b, cfg, verbose=False)
        if r.validation is not None and not r.validation.passed:
            lines.append(f"| {tracks} | {pc:.3f} | {as_:.3f} | "
                         "VALIDATION FAIL | |")
            continue
        ss = r.saturated_statistics
        ms = ss.median if ss else float("nan")
        dev = (r.device_statistics.median
               if r.device_statistics else float("nan"))
        verdict = "✓" if ms <= cfg.deadline_ms() else "✗ MISS"
        lines.append(
            f"| {tracks} | {pc:.3f} ms | {as_:.3f} ms | "
            f"**{ms:.3f} ms** {verdict} (d{depth}) | {dev:.4f} |"
        )
        print(f"tracks {tracks}: sat {ms:.3f} ms, device {dev:.4f} ms")
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"written: {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
