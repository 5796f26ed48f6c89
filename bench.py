"""Headline benchmark: modal synthesis, 1M modes, 512-sample block.

Runs the suite's flagship workload (the DAFx-24 poster's tab4 headline:
1,000,000-mode modal synthesis into a 512-sample buffer, transfer +
kernel round trip) on the local accelerator and prints ONE JSON line:

  {"metric": "modal_1M_p50_ms", "value": <p50 ms>, "unit": "ms",
   "vs_baseline": <RTX4070_p50 / value>}

vs_baseline > 1 means faster than the reference's PC platform
(i7-12700 + RTX 4070, p50 = 3.168 ms, BASELINE.md tab4 row "Modal,
1,000,000 modes").
"""

from __future__ import annotations

import json
import sys

BASELINE_PC_P50_MS = 3.168  # BASELINE.md: Modal 1M modes, PC p50


def main() -> int:
    from gpuaudiobench_tpu.config import BenchConfig
    from gpuaudiobench_tpu.harness.runner import run_benchmark
    from gpuaudiobench_tpu.registry import create_benchmark

    cfg = BenchConfig(
        n_tracks=1024,  # modes = min(1024*1024, 1M) = 1M
        buffer_size=512,
        n_runs=50,
        warmup=5,
        write_latencies=False,
        device_timing=False,
        verification="spot",
    )
    bench = create_benchmark("ModalFilterBank", cfg)
    bench.setup()
    result = run_benchmark(bench, cfg, verbose=False)
    if result.validation is not None and not result.validation.passed:
        print(
            json.dumps(
                {
                    "metric": "modal_1M_p50_ms",
                    "value": float("nan"),
                    "unit": "ms",
                    "vs_baseline": 0.0,
                    "error": "validation failed",
                }
            )
        )
        return 1
    p50 = result.statistics.median
    print(
        json.dumps(
            {
                "metric": "modal_1M_p50_ms",
                "value": round(p50, 4),
                "unit": "ms",
                "vs_baseline": round(BASELINE_PC_P50_MS / p50, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
