"""Co-located projection (utils/projection.py): quantifying what the
relay-dominated round-trip rows would cost on a co-located host
(VERDICT r2 #6)."""

import pytest

from gpuaudiobench_tpu.harness.runner import run_benchmark
from gpuaudiobench_tpu.registry import create_benchmark
from gpuaudiobench_tpu.utils.projection import (
    LAUNCH_OVERHEAD_MS,
    PCIE_CLASS_BYTES_PER_SEC,
    projected_colocated,
)


def test_projection_math():
    # 10.94 MB each way at 10.94 GB/s = 1 ms each way.
    p = projected_colocated(2.0, 10.94e6, 10.94e6)
    assert p["transfer_ms"] == pytest.approx(2.0)
    assert p["projected_colocated_ms"] == pytest.approx(
        LAUNCH_OVERHEAD_MS + 2.0 + 2.0
    )
    assert projected_colocated(None, 1, 1) is None


def test_pcie_rate_matches_tab5():
    """The rate constant must be the poster's own tab5 measurement:
    100 MiB / mean(PC p50 over the five mixes) (BASELINE.md)."""
    p50s = [10.06, 9.84, 9.57, 9.37, 9.09]
    rate = 100 * 1024 * 1024 / (sum(p50s) / len(p50s) / 1e3)
    assert PCIE_CLASS_BYTES_PER_SEC == pytest.approx(rate, rel=0.01)


def test_transfer_models(small_cfg):
    """Per-benchmark transfer declarations match what iterate() moves."""
    cases = {
        # standard in/out pair
        "gain": (8 * 64 * 4, 8 * 64 * 4),
        # pool resident: playheads up, interleaved out down
        "RndMemRead": (8 * 4, 8 * 64 * 4),
        # params resident: readback only
        "ModalFilterBank": (0, 8 * 64 * 4),
    }
    for name, (h2d, d2h) in cases.items():
        b = create_benchmark(name, small_cfg)
        b.setup()
        tm = b.transfer_model()
        assert (tm["h2d_bytes"], tm["d2h_bytes"]) == (h2d, d2h), name

    # datacopy: the mix IS the workload
    b = create_benchmark("datacopy2080", small_cfg.replace(transfer_mib=1))
    b.setup()
    tm = b.transfer_model()
    pool = 1024 * 1024 // 4
    assert tm["h2d_bytes"] == int(pool * 0.20) * 4
    assert tm["d2h_bytes"] == int(pool * 0.80) * 4

    # FFT: real frames up, complex spectra down
    b = create_benchmark("FFT1D", small_cfg)
    b.setup()
    tm = b.transfer_model()
    assert tm["d2h_bytes"] == 8 * b.bins * 2 * 4


def test_runner_attaches_projection_on_tpu(small_cfg, monkeypatch):
    from gpuaudiobench_tpu.utils import device as dev

    cfg = small_cfg.replace(device_timing=True, pipeline_depth=4,
                            saturated_reps=2)
    b = create_benchmark("gain", cfg)
    b.setup()
    result = run_benchmark(b, cfg, verbose=False)
    assert "projection" not in result.metadata  # CPU backend: skipped

    monkeypatch.setattr(dev, "is_tpu", lambda: True)
    b2 = create_benchmark("gain", cfg)
    b2.setup()
    result = run_benchmark(b2, cfg, verbose=False)
    proj = result.metadata.get("projection")
    assert proj is not None
    assert proj["projected_colocated_ms"] > proj["device_ms"]
    assert proj["h2d_bytes"] == proj["d2h_bytes"] == 8 * 64 * 4
    assert proj["basis"] in ("device:pipeline-slope", "saturated")
