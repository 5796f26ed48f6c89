"""End-to-end benchmark tests: every registered benchmark runs on the
scaled-down config and passes its own golden-case validation -- the
hardware-free CI mode the reference lacks (SURVEY.md s4)."""

import numpy as np
import pytest

from gpuaudiobench_tpu.harness.runner import run_benchmark
from gpuaudiobench_tpu.registry import BENCHMARK_NAMES, create_benchmark

FAST_NAMES = [n for n in BENCHMARK_NAMES if n != "FDTD3D"]


@pytest.mark.parametrize("name", FAST_NAMES)
def test_benchmark_validates(small_cfg, name):
    bench = create_benchmark(name, small_cfg)
    bench.setup()
    result = run_benchmark(bench, small_cfg, verbose=False)
    assert result.validation is not None
    assert result.validation.passed, (
        f"{name}: {result.validation.messages[:3]}"
    )
    assert len(result.latencies) == small_cfg.n_runs
    assert result.statistics.count == small_cfg.n_runs
    assert result.statistics.mean > 0


@pytest.mark.slow
def test_fdtd3d_validates(small_cfg):
    cfg = small_cfg.replace(buffer_size=32)
    bench = create_benchmark("FDTD3D", cfg)
    bench.setup()
    result = run_benchmark(bench, cfg, verbose=False)
    assert result.validation.passed, result.validation.messages[:3]


def test_registry_has_17_names():
    assert len(BENCHMARK_NAMES) == 17


def test_gain_golden_values(small_cfg):
    bench = create_benchmark("gain", small_cfg)
    bench.setup()
    bench.iterate()
    np.testing.assert_allclose(
        bench.host_output, 2.0 * bench.host_input, atol=1e-6
    )


def test_iir_repeated_iterations_stay_valid(small_cfg):
    # State persists on-device across iterations (reference semantics,
    # models/iir.py); the golden carries state once per performed
    # iteration, so validation holds for any iteration count.
    cfg = small_cfg.replace(buffer_size=512)
    bench = create_benchmark("IIRFilter", cfg)
    bench.setup()
    for _ in range(5):
        bench.iterate()
    v = bench.validate()
    assert v.passed, v.messages[:3]


def test_rndmem_playheads_advance(small_cfg):
    bench = create_benchmark("RndMemRead", small_cfg)
    bench.setup()
    ph0 = bench.playheads.copy()
    bench.iterate()
    ph1 = bench.playheads
    assert not np.array_equal(ph0, ph1)
    # each advanced by bufferSize or wrapped to its loop start
    advanced = ph1 == ph0 + small_cfg.buffer_size
    wrapped = ph1 == bench.playheads_start.astype(np.int32)
    assert np.all(advanced | wrapped)
    assert bench.validate().passed


def test_verification_modes(small_cfg):
    for mode in ("full", "spot", "none"):
        cfg = small_cfg.replace(verification=mode)
        bench = create_benchmark("gain", cfg)
        bench.setup()
        bench.iterate()
        v = bench.validate()
        assert v.passed
        if mode == "none":
            assert v.samples_checked == 0


def test_biquad_chain_extension(small_cfg):
    bench = create_benchmark("BiquadChain", small_cfg)
    bench.setup()
    result = run_benchmark(bench, small_cfg, verbose=False)
    assert result.validation.passed, result.validation.messages[:3]
    assert result.metadata["numStages"] == 10


def test_fdtd_per_track_receivers(small_cfg):
    """WebGPU parity: --fdtdPerTrackReceivers gives each track its own
    receiver cell on the x line at mid y/z (FDTD3DBenchmark.js:57-67)."""
    import numpy as np

    cfg = small_cfg.replace(buffer_size=16, n_tracks=4,
                            fdtd_per_track_receivers=True)
    bench = create_benchmark("FDTD3D", cfg)
    bench.setup()
    v = bench.validate()
    assert v.passed, v.messages[:3]
    # tracks read different cells -> rows differ bitwise (in broadcast
    # mode all rows are the identical receiver trace)
    out = np.asarray(bench.host_output)
    assert len({row.tobytes() for row in out}) > 1
    assert bench.metadata()["receiver"] == "per-track line"


def test_fdtd_source_receiver_ghost_offset():
    """Round-2 parity fix: source/receiver carry the one-cell ghost
    offset (grid (26,26,6)/(41,16,26) in the 52^3 grid, matching
    bench_fdtd3d's indexing)."""
    from gpuaudiobench_tpu.ops import fdtd3d as op

    assert op.SOURCE == (26, 26, 6)
    assert op.RECEIVER == (41, 16, 26)
