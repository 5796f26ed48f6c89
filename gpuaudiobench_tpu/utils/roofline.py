"""Roofline / MFU accounting for TPU v5e.

Each benchmark declares an algorithmic cost model (FLOPs + minimum HBM
bytes per block, plus which unit does the work); combined with the
measured on-device block time (harness/device_timing.py) this yields
achieved GFLOP/s and GB/s as a fraction of chip peaks, answering "is
this ms/block actually good for this chip?" -- the accounting the
reference's GB/s throughput fields (cuda/bench_base.cu:110-115) gesture
at, taken to %-of-peak.

Peaks (TPU v5e, public spec sheet / jax-ml.github.io/scaling-book):
  * MXU: 197 TFLOP/s bf16 (f32 inputs via MXU passes run lower; the
    suite's only MXU op, Conv1D, runs f32 -> compare against the f32
    MXU rate, ~1/4 of bf16).
  * VPU (vector, f32): ~3.9 TFLOP/s -- 8x128-lane VPU at ~940 MHz with
    4-way issue; an estimate (Google publishes no VPU number), used for
    elementwise/recurrence workloads.
  * HBM: 819 GB/s.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

V5E_PEAK = {
    "mxu_bf16_flops": 197e12,
    "mxu_f32_flops": 197e12 / 4,
    "vpu_f32_flops": 3.9e12,
    "hbm_bytes_per_sec": 819e9,
}

UNIT_PEAK_KEY = {
    "mxu": "mxu_f32_flops",
    "mxu_bf16": "mxu_bf16_flops",
    "vpu": "vpu_f32_flops",
}


def roofline_metrics(
    cost: Dict[str, Any], device_ms: float
) -> Optional[Dict[str, Any]]:
    """Achieved rates vs peak for one block.

    ``cost``: {"flops": N, "hbm_bytes": N, "unit": "vpu"|"mxu"|"none",
    optional "note"}. ``device_ms``: measured on-device block time.
    """
    if device_ms <= 0:
        return None
    sec = device_ms / 1e3
    flops = float(cost.get("flops", 0))
    hbm_bytes = float(cost.get("hbm_bytes", 0))
    unit = cost.get("unit", "vpu")
    out: Dict[str, Any] = {
        "device_ms": device_ms,
        "flops_per_block": flops,
        "hbm_bytes_per_block": hbm_bytes,
        "achieved_gflops": flops / sec / 1e9,
        "achieved_gbps": hbm_bytes / sec / 1e9,
        "hbm_pct_of_peak": 100.0 * (hbm_bytes / sec) / V5E_PEAK["hbm_bytes_per_sec"],
        "unit": unit,
    }
    peak_key = UNIT_PEAK_KEY.get(unit)
    if peak_key and flops > 0:
        out["flops_pct_of_peak"] = 100.0 * (flops / sec) / V5E_PEAK[peak_key]
        # Which wall is closer: the workload is X-bound.
        out["bound"] = (
            "compute" if out["flops_pct_of_peak"] >= out["hbm_pct_of_peak"]
            else "bandwidth"
        )
    else:
        out["bound"] = "bandwidth"
    if "note" in cost:
        out["note"] = cost["note"]
    return out
