"""Measure the roofline denominators on the chip and persist them.

Runs the speedoflight category (SOL_VPU / SOL_VMEM / SOL_HBM / SOL_MXU_bf16 /
SOL_MXU_f32, models/speedoflight.py) through the standard harness on
the current device and writes the achieved rates -- which by
construction ARE the peaks -- to
``gpuaudiobench_tpu/utils/measured_peaks.json``, where
utils/roofline.py picks them up for every subsequent %-of-peak claim.

Rate basis: the xplane device-plane median (the chip's own record of
the executable's duration; chip-true on this relay rig), falling back
to the saturated per-block median (which carries a small amortized RPC
residual, so it UNDER-estimates the peak -- conservative in the safe
direction: real kernels then report slightly higher %-of-peak, never
an inflated denominator).

Usage:
    python tools/calibrate_peaks.py [--nRuns 10] [--pipelineDepth 256]
                                    [--out PATH] [--dry]
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from gpuaudiobench_tpu.config import BenchConfig  # noqa: E402
from gpuaudiobench_tpu.utils.roofline import (  # noqa: E402
    MEASURED_PEAKS_PATH,
    SPEC_PEAK,
)

# SOL benchmark -> which peak key its achieved rate calibrates, and
# whether the rate comes from flops or bytes.
TARGETS = {
    "SOL_VPU": ("vpu_f32_flops", "flops"),
    "SOL_VMEM": ("vmem_bytes_per_sec", "vmem_bytes"),
    "SOL_HBM": ("hbm_bytes_per_sec", "hbm_bytes"),
    "SOL_MXU_bf16": ("mxu_bf16_flops", "flops"),
    "SOL_MXU_f32": ("mxu_f32_flops", "flops"),
    "SOL_MXU_int8": ("mxu_int8_flops", "flops"),
}


def measure(cfg: BenchConfig, name: str) -> dict:
    from gpuaudiobench_tpu.harness.runner import run_benchmark
    from gpuaudiobench_tpu.registry import create_benchmark

    bench = create_benchmark(name, cfg)
    bench.setup()
    result = run_benchmark(bench, cfg, verbose=False)
    if result.validation is None or not result.validation.passed:
        raise RuntimeError(
            f"{name} failed validation: "
            f"{(result.validation.messages if result.validation else [])[:3]}"
        )
    cost = bench.cost_model()
    row = {
        "benchmark": name,
        "metadata": bench.metadata(),
        "cost": cost,
        "device_ms": (
            result.device_statistics.median
            if result.device_statistics is not None else None
        ),
        "device_timing_method": result.device_timing_method,
        "saturated_p50_ms": (
            result.saturated_statistics.median
            if result.saturated_statistics is not None else None
        ),
    }
    # Peak basis: xplane device time, else saturated (conservative).
    basis_ms, basis = None, None
    if row["device_ms"] and result.device_timing_method == "xplane":
        basis_ms, basis = row["device_ms"], "xplane"
    elif row["saturated_p50_ms"]:
        basis_ms, basis = row["saturated_p50_ms"], "saturated"
    elif row["device_ms"]:
        basis_ms, basis = row["device_ms"], result.device_timing_method
    if name == "SOL_VMEM" and row["metadata"].get("impl") != "pallas":
        # The XLA fallback computes the same values but keeps the loop
        # carry register/cache-resident: its rate is an FMA rate, not a
        # VMEM rate. Persisting it would fabricate a 'measured' peak.
        raise RuntimeError(
            "SOL_VMEM ran the XLA fallback (impl="
            f"{row['metadata'].get('impl')!r}); a VMEM peak can only be "
            "calibrated from the Pallas VMEM-carried body"
        )
    if basis_ms is None or basis_ms <= 0:
        raise RuntimeError(f"{name}: no usable timing basis")
    key, quantity = TARGETS[name]
    rate = float(cost[quantity]) / (basis_ms / 1e3)
    row.update({"basis": basis, "basis_ms": basis_ms, "peak_key": key,
                "measured_rate": rate})
    bench.cleanup()
    return row


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--nRuns", type=int, default=10)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--pipelineDepth", type=int, default=256)
    ap.add_argument("--out", default=MEASURED_PEAKS_PATH)
    ap.add_argument("--dry", action="store_true",
                    help="print, do not write the json")
    args = ap.parse_args(argv)

    cfg = BenchConfig(
        n_runs=args.nRuns, warmup=args.warmup,
        pipeline_depth=args.pipelineDepth,
        verification="spot", write_latencies=False,
        # Peaks use the xplane basis; the marginal tier's second chain
        # would only slow calibration down.
        saturated_marginal=False,
    )

    from gpuaudiobench_tpu.utils import device as dev

    kind = dev.default_device().device_kind
    print(f"Calibrating peaks on: {kind} [{dev.platform()}]")

    rows, peaks = [], {}
    for name in TARGETS:
        print(f"  {name} ...", flush=True)
        try:
            row = measure(cfg, name)
        except RuntimeError as e:
            if name == "SOL_VMEM" and "XLA fallback" in str(e):
                # Off-Pallas there is no honest VMEM number; leave the
                # key uncalibrated -- resolve_peaks will disclose it as
                # +spec:vmem_bytes_per_sec instead of lying.
                print(f"    SKIPPED: {e}")
                continue
            raise
        rows.append(row)
        peaks[row["peak_key"]] = row["measured_rate"]
        unit = ("GB/s" if row["peak_key"].endswith("bytes_per_sec")
                else "GFLOP/s")
        spec = SPEC_PEAK[row["peak_key"]]
        print(
            f"    {row['measured_rate'] / 1e9:,.1f} {unit} "
            f"[{row['basis']} {row['basis_ms']:.4f} ms] "
            f"(spec estimate was {spec / 1e9:,.1f})"
        )

    payload = {
        "device_kind": kind,
        "platform": dev.platform(),
        "measured_at": datetime.date.today().isoformat(),
        "config": {
            "nRuns": args.nRuns, "pipelineDepth": args.pipelineDepth,
            "solFmaK": cfg.sol_fma_k, "solFmaMiB": cfg.sol_fma_mib,
            "solVmemMiB": cfg.sol_vmem_mib,
            "solStreamMiB": cfg.sol_stream_mib,
            "solMatmulDim": cfg.sol_matmul_dim,
        },
        "peaks": peaks,
        "raw": rows,
    }
    if args.dry:
        print(json.dumps(payload, indent=2))
        return 0
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=2)
        f.write("\n")
    print(f"Wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
