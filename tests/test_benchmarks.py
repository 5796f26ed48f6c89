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
    # State is re-uploaded as zero each iteration (documented divergence,
    # models/iir.py) so validation holds for any iteration count.
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
