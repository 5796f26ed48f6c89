"""On-chip serial-vs-overlapped infeed campaign (VERDICT r3 next #2).

Runs the overlapped-infeed tier (harness/overlap.py) for the datacopy
family and the stateful flagships in ONE process (one relay session,
sequential), and writes a markdown artifact with per-benchmark
serial/overlapped ms/block, the measured speedup, and the projection's
two bounds for context.

Usage: python tools/overlap_campaign.py [out.md] [--depth 64] [--reps 7]
"""

from __future__ import annotations

import _pathfix  # noqa: F401,E402 - repo-root sys.path (tools/_pathfix.py)

import argparse
import json
import os

BENCHES = [
    "datacopy0199", "datacopy5050", "datacopy9901",
    "gain", "GainStats", "FFT1D", "Conv1D", "IIRFilter",
    "DWG1DNaive", "RndMemRead", "NeuralAmp", "PartConv",
    "DAWSessionMix",
]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("out", nargs="?",
                    default=os.path.join(os.path.dirname(__file__), "..",
                                         "docs", "RESULTS_r4_overlap.md"))
    ap.add_argument("--depth", type=int, default=64)
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--bufferSize", type=int, default=512)
    ap.add_argument("--benches", default=",".join(BENCHES))
    args = ap.parse_args(argv)

    from gpuaudiobench_tpu.config import BenchConfig
    from gpuaudiobench_tpu.harness.output import generate_json_results
    from gpuaudiobench_tpu.harness.runner import run_benchmark
    from gpuaudiobench_tpu.registry import create_benchmark

    rows = []
    raw = {}
    for name in args.benches.split(","):
        cfg = BenchConfig(
            n_runs=3, warmup=2, overlap_depth=args.depth,
            overlap_reps=args.reps, verification="spot",
            buffer_size=args.bufferSize,
            device_timing=True, write_latencies=False, quiet=True,
        )
        b = create_benchmark(name, cfg)
        b.setup()
        r = run_benchmark(b, cfg, verbose=False)
        out = generate_json_results(r, cfg)
        ov = out.get("overlapped")
        if ov is None:
            print(f"{name}: no overlap body (skipped)", flush=True)
            continue
        proj = (out.get("metadata") or {}).get("projection") or {}
        md_tc = ((out.get("metadata") or {})
                 .get("transferMemoryClass")
                 or (b.metadata().get("transferMemoryClass")
                     if hasattr(b, "_transfer_class_ab") else None))
        rows.append({
            "name": name,
            "serial": ov["serial_p50_ms"],
            "overlapped": ov["overlapped_p50_ms"],
            "speedup": ov["speedup_vs_serial"],
            "proj_serial": proj.get("projected_colocated_ms"),
            "proj_overlap": proj.get("projected_overlapped_ms"),
            "device_method": (out.get("device_statistics") or {}
                              ).get("method", ""),
            "pinned": (md_tc or {}).get("h2d_path_used", ""),
        })
        raw[name] = {"overlapped": ov,
                     "transferMemoryClass": md_tc,
                     "projection": proj}
        print(f"{name}: serial {ov['serial_p50_ms']:.3f} -> overlapped "
              f"{ov['overlapped_p50_ms']:.3f} ms/block "
              f"({ov['speedup_vs_serial']:.2f}x)", flush=True)

    lines = [
        "# Overlapped-infeed campaign (serial vs double-buffered "
        "upload, measured)",
        "",
        f"Buffer {args.bufferSize} @ 48 kHz (deadline "
        f"{1000.0 * args.bufferSize / 48000:.3f} ms). "
        f"`--overlapDepth {args.depth} --overlapReps {args.reps}` "
        "(harness/overlap.py). Serial = upload→compute→sync per block "
        "(on this relay rig the per-block sync pays the RPC floor — "
        "that floor is exactly what overlap amortizes, here and on any "
        "network-attached deployment). Overlapped = upload block k+1 "
        "while block k computes, one sync per pipeline. The projection "
        "columns give the co-located bounds for the same shapes "
        "(utils/projection.py). `h2d path` records pinned-host staging "
        "where the runtime supports it (VERDICT r3 #3).",
        "",
        "| Benchmark | serial ms/block | overlapped ms/block | speedup "
        "| proj serial (co-located) | proj overlapped | h2d path |",
        "|---|---:|---:|---:|---:|---:|---|",
    ]
    for r in rows:
        ps = f"{r['proj_serial']:.3f}" if r["proj_serial"] else "—"
        po = f"{r['proj_overlap']:.3f}" if r["proj_overlap"] else "—"
        lines.append(
            f"| {r['name']} | {r['serial']:.3f} | {r['overlapped']:.3f} "
            f"| {r['speedup']:.2f}x | {ps} | {po} | {r['pinned'] or '—'} |"
        )
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    with open(args.out.replace(".md", ".json"), "w") as f:
        json.dump(raw, f, indent=2)
    print(f"written: {args.out} (+.json)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
