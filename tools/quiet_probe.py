"""Quiet-window gate for relay-rig measurement campaigns.

The DWG-tail investigation (docs/RESULTS_r4_dwg_tail.json) proved the
suite's "poor"-stability rows are relay weather, not workload
variance: 26% CV re-measured at 4.2% inside a probe-verified quiet
window. VERDICT r4 next #2 asks for that discipline ON the regen, so
this gate runs a cheap probe (gain, the suite's canary) and blocks
until its round-trip CV is below threshold or tries run out.

Exit 0 = quiet window confirmed; exit 1 = never got one (campaign
scripts should record the gate result either way).

Usage: python tools/quiet_probe.py [--cv 5] [--tries 6] [--sleep 60]
"""

from __future__ import annotations

import _pathfix  # noqa: F401,E402 - repo-root sys.path (tools/_pathfix.py)

import argparse
import time


def probe_cv(n_runs: int = 15) -> float:
    from gpuaudiobench_tpu.config import BenchConfig
    from gpuaudiobench_tpu.harness.runner import run_benchmark
    from gpuaudiobench_tpu.harness.statistics import stability_rating
    from gpuaudiobench_tpu.registry import create_benchmark

    cfg = BenchConfig(n_runs=n_runs, warmup=3, verification="none",
                      device_timing=False, write_latencies=False,
                      quiet=True)
    b = create_benchmark("gain", cfg)
    b.setup()
    r = run_benchmark(b, cfg, verbose=False)
    cv, _ = stability_rating(r.latencies)
    return cv


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cv", type=float, default=5.0,
                    help="max round-trip CV%% to call the window quiet")
    ap.add_argument("--tries", type=int, default=6)
    ap.add_argument("--sleep", type=float, default=60.0,
                    help="seconds between probes")
    ap.add_argument("--nRuns", type=int, default=15)
    args = ap.parse_args(argv)

    for attempt in range(1, args.tries + 1):
        cv = probe_cv(args.nRuns)
        quiet = cv <= args.cv
        print(f"quiet_probe try {attempt}/{args.tries}: gain round-trip "
              f"CV {cv:.1f}% (threshold {args.cv}%) -> "
              f"{'QUIET' if quiet else 'noisy'}", flush=True)
        if quiet:
            return 0
        if attempt < args.tries:
            time.sleep(args.sleep)
    print("quiet_probe: no quiet window within budget", flush=True)
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
