"""Headline benchmark: modal synthesis, 1M modes, 512-sample blocks.

Runs the suite's flagship workload (the DAFx-24 poster's tab4 headline:
1,000,000-mode modal synthesis into a 512-sample buffer) on the local
accelerator and prints ONE JSON line:

  {"metric": "modal_1M_block_ms", "value": <ms/block at saturation>,
   "unit": "ms", "vs_baseline": <RTX4070_p50 / value>, ...}

value = per-block time with the dispatch pipeline kept full (the
blocks/sec/chip metric from BASELINE.json expressed as ms/block);
vs_baseline > 1 means faster than the reference's PC platform
(i7-12700 + RTX 4070, p50 = 3.168 ms, BASELINE.md tab4 "Modal,
1,000,000 modes"). The JSON line also carries the honest single-block
round-trip p50/p99 (which on this rig includes a ~28 ms relay
synchronization floor -- see .claude/skills/verify/SKILL.md) and the
validation verdict.

NOTE (axon relay): jax.block_until_ready is a no-op until the first
device-to-host read of a computed result, after which every sync is
honest; the benchmark forces honest mode before timing anything.
"""

from __future__ import annotations

import json
import sys

BASELINE_PC_P50_MS = 3.168  # BASELINE.md: Modal 1M modes, RTX 4070 p50
PIPELINE_DEPTH = 512


def main(n_tracks: int = 1024, n_runs: int = 30, warmup: int = 5,
         pipeline_depth: int = PIPELINE_DEPTH) -> int:
    # Keyword knobs exist ONLY so tests can run the same code path at toy
    # sizes (tests/test_cli_integration.py); the driver always runs the
    # defaults = the headline 1M-mode configuration.
    import numpy as np

    from gpuaudiobench_tpu.config import BenchConfig
    from gpuaudiobench_tpu.harness.runner import run_benchmark
    from gpuaudiobench_tpu.registry import create_benchmark

    cfg = BenchConfig(
        n_tracks=n_tracks,  # modes = min(n_tracks*1024, 1M); default 1M
        buffer_size=512,
        n_runs=n_runs,
        warmup=warmup,
        write_latencies=False,
        device_timing=False,
        verification="spot",
        pipeline_depth=pipeline_depth,  # harness saturated/streaming pass
    )
    bench = create_benchmark("ModalFilterBank", cfg)
    bench.setup()

    # Force honest synchronization before any timing (setup's iterate()
    # already read a computed result back; this is a defensive second).
    out, _, _ = bench._run()
    _ = np.asarray(out)

    result = run_benchmark(bench, cfg, verbose=False)
    if result.validation is not None and not result.validation.passed:
        print(
            json.dumps(
                {
                    "metric": "modal_1M_block_ms",
                    "value": float("nan"),
                    "unit": "ms",
                    "vs_baseline": 0.0,
                    "error": "validation failed",
                    "messages": result.validation.messages[:3],
                }
            )
        )
        return 1

    # Saturated throughput from the harness streaming pass: PIPELINE_DEPTH
    # consecutive blocks in ONE executable with phasor state carried across
    # blocks (harness/streaming.py), amortizing per-dispatch RPC overhead.
    # value = MEDIAN over the saturated reps (each rep is already a mean
    # over PIPELINE_DEPTH blocks): the reference's own discipline is
    # percentile-based (cuda/globals.cu:101-122), and min-of-means is the
    # one estimator that can only improve with more reps (VERDICT r3 weak
    # #4) -- rounds 1-3 reported min; the min ships alongside as
    # saturated_rep_min_ms so the r1-r3 series stays comparable.
    sat_p50 = result.saturated_statistics.median
    per_block = sat_p50
    sat_min = result.saturated_statistics.min_val

    rec = {
        "metric": "modal_1M_block_ms",
        "value": round(per_block, 4),
        "unit": "ms",
        # Estimator of "value", machine-readable (ADVICE r4: rounds 1-3
        # published min-of-reps; r4+ publish the rep-median -- consumers
        # trending "value" across rounds can now detect the change).
        "value_stat": "rep_p50",
        "vs_baseline": round(BASELINE_PC_P50_MS / per_block, 3),
        "blocks_per_sec_per_chip": round(1000.0 / per_block, 1),
        "saturated_rep_p50_ms": round(sat_p50, 4),
        "saturated_rep_min_ms": round(sat_min, 4),
        "roundtrip_p50_ms": round(result.statistics.median, 3),
        "roundtrip_p99_ms": round(result.statistics.p99, 3),
        "validation": "passed",
    }
    # Marginal saturated tier (r5): depth-differenced per-block cost
    # with the rig's fixed sync floor cancelled (harness/streaming.
    # measure_saturated_marginal). For this 1M-mode workload the floor
    # share is small (~6% at depth 512) but nonzero; the marginal is
    # the chip's true rate. "value" stays the amortized rep-median for
    # cross-round continuity (value_stat documents the definition).
    if result.saturated_marginal_statistics is not None:
        marg_p50 = result.saturated_marginal_statistics.median
        rec["saturated_marginal_p50_ms"] = round(marg_p50, 4)
        rec["marginal_lo_depth"] = result.saturated_lo_depth
        if marg_p50 > 0:
            rec["blocks_per_sec_marginal"] = round(1000.0 / marg_p50, 1)
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    sys.exit(main())
