"""ModalFilterBank mode-count sweep: the DAFx-24 poster's tab4 analog.

Records saturated ms/block and on-device ms at 1k/100k/1M modes next
to the published RTX 4070 / M2 Pro p50s, regenerating the headline
comparison (`analysis/compare.py` MODAL_SWEEP) from one shipped tool.

Usage: python tools/modal_sweep.py [output.md]
"""

from __future__ import annotations

import _pathfix  # noqa: F401,E402 - repo-root sys.path (tools/_pathfix.py)

import sys

# (modes, pipeline depth, RTX 4070 p50 ms, M2 Pro p50 ms) --
# published numbers from BASELINE.md tab4.
POINTS = [
    (1024, 256, 0.050, 0.172),
    (102400, 256, 0.315, 0.611),
    (1048576, 512, 3.168, 5.717),
]


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "docs/RESULTS_r3_modal.md"
    from gpuaudiobench_tpu.config import BenchConfig
    from gpuaudiobench_tpu.harness.runner import run_benchmark
    from gpuaudiobench_tpu.registry import create_benchmark

    lines = [
        "# Modal mode-count sweep (TPU v5e; tab4 analog)",
        "",
        "Saturated ms/block for a 512-sample buffer from the",
        "--pipelineDepth streaming pass (phasor state carried across",
        "blocks in one executable). Published p50s from BASELINE.md tab4.",
        "",
        "| Modes | RTX 4070 p50 | M2 Pro p50 | TPU saturated (depth) | TPU device ms | vs PC |",
        "|---:|---:|---:|---:|---:|---:|",
    ]
    for modes, depth, pc, as_ in POINTS:
        cfg = BenchConfig(
            n_runs=3, warmup=2, pipeline_depth=depth, saturated_reps=3,
            modal_num_modes=modes, write_latencies=False,
            verification="spot",
        )
        b = create_benchmark("ModalFilterBank", cfg)
        b.setup()
        r = run_benchmark(b, cfg, verbose=False)
        if r.validation is not None and not r.validation.passed:
            lines.append(f"| {modes} | {pc:.3f} | {as_:.3f} | "
                         "VALIDATION FAIL | | |")
            continue
        ss = r.saturated_statistics
        ms = ss.median if ss else float("nan")
        dev = (r.device_statistics.median
               if r.device_statistics else float("nan"))
        verdict = "✓" if ms <= cfg.deadline_ms() else "✗ MISS"
        lines.append(
            f"| {modes} | {pc:.3f} ms | {as_:.3f} ms | "
            f"**{ms:.3f} ms** {verdict} (d{depth}) | {dev:.4f} | "
            f"{pc / ms:.1f}x |"
        )
        print(f"modes {modes}: sat {ms:.3f} ms, device {dev:.4f} ms")
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"written: {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
