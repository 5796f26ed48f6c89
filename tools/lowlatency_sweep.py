"""Low-latency sweep: saturated ms/block across buffer sizes.

Pro-audio rigs run far below the suite's default 512-sample buffer;
this records the saturated per-block time at bufferSize 64/128/256/512
(deadlines 1.33/2.67/5.33/10.67 ms at 48 kHz) for the compute-heavy
benchmarks, answering "how small a buffer can this chip serve in real
time?" -- a dimension the reference's tables never measure.

Usage: python tools/lowlatency_sweep.py [output.md]
"""

from __future__ import annotations

import _pathfix  # noqa: F401,E402 - repo-root sys.path (tools/_pathfix.py)

import sys

BUFFERS = [64, 128, 256, 512]
WORKLOADS = [
    # (label, benchmark, cfg overrides, depth)
    ("Modal 1M modes", "ModalFilterBank", dict(n_tracks=1024), 256),
    ("IIRFilter (128 trk)", "IIRFilter", dict(), 256),
    ("Conv1D (128 trk, IR 1024)", "Conv1D", dict(), 256),
    ("DWG 1024 voices", "DWG1DNaive", dict(n_tracks=1024), 256),
    ("FDTD3D (52^3 x 3/sample)", "FDTD3D", dict(), 64),
    ("RndMem 16384 trk (512 MiB)", "RndMemRead",
     dict(n_tracks=16384), 64),
    ("BiquadChain 10 stages", "BiquadChain", dict(), 256),
    ("PartConv 1 s IR (128 trk)", "PartConv", dict(), 256),
    ("NeuralAmp TCN d10 (128 trk)", "NeuralAmp", dict(), 64),
    ("NeuralAmp TCN d10 bf16", "NeuralAmp",
     dict(neuralamp_dtype="bf16"), 64),
    ("NeuralAmpLSTM H128 (128 trk)", "NeuralAmpLSTM", dict(), 64),
    ("DAWSessionMix (128 strips, 1 s rev)", "DAWSessionMix", dict(), 256),
]


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "docs/RESULTS_r3_lowlatency.md"
    from gpuaudiobench_tpu.config import BenchConfig
    from gpuaudiobench_tpu.harness.runner import run_benchmark
    from gpuaudiobench_tpu.registry import create_benchmark

    lines = [
        "# Low-latency sweep (TPU v5e): saturated ms/block vs buffer size",
        "",
        "Real-time budget at 48 kHz = 1000*bufferSize/48000 ms. Saturated",
        "per-block time from the --pipelineDepth streaming pass (includes",
        "the amortized relay-RPC residual; on-device time is lower).",
        "",
        "| Workload | buf 64 (ddl 1.33) | buf 128 (2.67) | buf 256 (5.33) | buf 512 (10.67) |",
        "|---|---:|---:|---:|---:|",
    ]
    for label, name, overrides, depth in WORKLOADS:
        cells = []
        for bs in BUFFERS:
            cfg = BenchConfig(
                buffer_size=bs, n_runs=3, warmup=2, pipeline_depth=depth,
                saturated_reps=3, write_latencies=False, device_timing=False,
                verification="spot", **overrides,
            )
            b = create_benchmark(name, cfg)
            b.setup()
            r = run_benchmark(b, cfg, verbose=False)
            if r.validation is not None and not r.validation.passed:
                cells.append("VALIDATION FAIL")
                continue
            ss = r.saturated_statistics
            ms = ss.median if ss else float("nan")
            verdict = "✓" if ms <= cfg.deadline_ms() else "✗ MISS"
            cells.append(f"{ms:.3f} {verdict}")
            print(f"{label} @ buf {bs}: {cells[-1]}")
        lines.append(f"| {label} | " + " | ".join(cells) + " |")
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"written: {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
