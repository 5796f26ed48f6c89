"""Device-timing subsystem: xplane trace extraction, pipeline-slope
fallback, and runner integration. On the CPU test backend the profiler
trace has no /device: plane, so the slope path is what exercises here;
the xplane parser is covered via the plane-walking helper on a real
trace file."""

import glob
import tempfile

import numpy as np

from gpuaudiobench_tpu.harness.device_timing import (
    _device_plane_events,
    measure_device_times,
    slope_device_times,
    trace_device_times,
)
from gpuaudiobench_tpu.harness.runner import run_benchmark
from gpuaudiobench_tpu.registry import create_benchmark


def test_trace_has_no_device_plane_on_cpu(small_cfg):
    b = create_benchmark("gain", small_cfg)
    b.setup()
    assert trace_device_times(b.device_iterate, 3) is None


def test_device_plane_events_reads_real_trace():
    """The xplane walker parses an actual trace file (host planes only
    on CPU -> None, but the proto loads and iterates)."""
    import jax
    import jax.numpy as jnp

    d = tempfile.mkdtemp()
    f = jax.jit(lambda a: a * 2.0)
    x = jnp.ones((8, 8), jnp.float32)
    _ = np.asarray(f(x))
    jax.profiler.start_trace(d)
    _ = np.asarray(f(x))
    jax.profiler.stop_trace()
    assert glob.glob(d + "/**/*.xplane.pb", recursive=True)
    assert _device_plane_events(d) is None  # no /device: plane on CPU


def test_slope_device_times(small_cfg):
    b = create_benchmark("gain", small_cfg)
    b.setup()
    step_fn, carry = b.stream_body()
    times = slope_device_times(step_fn, carry, reps=2, d1=2, d2=8)
    assert len(times) == 2
    assert all(t >= 0 for t in times)


def test_measure_device_times_methods(small_cfg):
    b = create_benchmark("gain", small_cfg)
    b.setup()
    times, method = measure_device_times(b, small_cfg)
    assert method == "pipeline-slope"  # no device plane on CPU backend
    assert times and all(t >= 0 for t in times)

    dc = create_benchmark("datacopy5050", small_cfg.replace(transfer_mib=1))
    dc.setup()
    times, method = measure_device_times(dc, small_cfg)
    assert method == "wall"  # no streaming body either
    assert times and all(t > 0 for t in times)


def test_runner_records_method(small_cfg):
    cfg = small_cfg.replace(device_timing=True)
    b = create_benchmark("gain", cfg)
    b.setup()
    result = run_benchmark(b, cfg, verbose=False)
    assert result.device_statistics is not None
    assert result.device_timing_method == "pipeline-slope"

    from gpuaudiobench_tpu.harness.output import generate_json_results

    out = generate_json_results(result, cfg)
    assert out["device_statistics"]["method"] == "pipeline-slope"
