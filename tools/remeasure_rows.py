"""Re-measure named suite rows at high rep count and splice them into
the suite JSON artifact.

VERDICT r4 next #2: the archived r4 suite carried five rows whose
saturated CV was "poor"/"fair" (NoOp 34%, DWG1DAccel 28%,
datacopy5050 24%, IIRFilter 21%, RndMemRead 21%) even though round 4
proved the class is relay weather (DWG tail: 26% -> 4.2% at n=101 in
a quiet window). This tool re-runs the named benchmarks with the SAME
suite configuration but --saturatedReps N (>= 101 for a true p99) and
replaces their rows in the suite JSON in place; the CSV and rendered
docs then re-derive from the updated JSON via the existing
single-sourcing pipeline (tools/json_to_csv.py,
tools/render_results.py). Each replaced row's "reps" field discloses
its rep count, so mixed-rep artifacts are self-describing.

datacopy5050 has no saturated tier (round-trip family): its re-measure
raises nRuns instead (the unstable statistic there IS the round trip).

Usage:
    python tools/remeasure_rows.py suite.json NoOp DWG1DAccel ... \
        [--satReps 101] [--nRuns 20] [--pipelineDepth 256]
"""

from __future__ import annotations

import _pathfix  # noqa: F401,E402 - repo-root sys.path (tools/_pathfix.py)

import argparse
import json


def remeasure(name: str, args):
    from gpuaudiobench_tpu.config import BenchConfig
    from gpuaudiobench_tpu.harness.output import generate_json_results
    from gpuaudiobench_tpu.harness.runner import run_benchmark
    from gpuaudiobench_tpu.registry import create_benchmark

    is_roundtrip = name.startswith("datacopy")
    cfg = BenchConfig(
        n_runs=(args.satReps if is_roundtrip else args.nRuns),
        warmup=3,
        pipeline_depth=0 if is_roundtrip else args.pipelineDepth,
        saturated_reps=args.satReps,
        verification="full",
        write_latencies=False,
        quiet=True,
    )
    b = create_benchmark(name, cfg)
    b.setup()
    r = run_benchmark(b, cfg, verbose=False)
    return generate_json_results(r, cfg)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("suite_json")
    ap.add_argument("benchmarks", nargs="+")
    ap.add_argument("--satReps", type=int, default=101)
    ap.add_argument("--nRuns", type=int, default=20)
    ap.add_argument("--pipelineDepth", type=int, default=256)
    args = ap.parse_args(argv)

    with open(args.suite_json) as f:
        suite = json.load(f)
    index = {r["benchmark"]: i for i, r in enumerate(suite)}

    for name in args.benchmarks:
        if name not in index:
            raise SystemExit(f"{name} not in {args.suite_json}")
        print(f"remeasure: {name} (satReps {args.satReps}) ...",
              flush=True)
        row = remeasure(name, args)
        sat = row.get("saturated") or {}
        stats = row.get("statistics") or {}
        print(f"  -> sat p50 {sat.get('p50_ms')} CV "
              f"{sat.get('cv_percent')}% ({sat.get('stability')}); "
              f"roundtrip CV {stats.get('cv_percent')}%", flush=True)
        suite[index[name]] = row
        # Persist after EVERY row: a timeout mid-campaign must not
        # lose the rows already measured (queue discipline,
        # docs/OPERATIONS.md).
        with open(args.suite_json, "w") as f:
            json.dump(suite, f, indent=2)
    print(f"updated: {args.suite_json}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
