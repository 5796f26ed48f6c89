"""Phase profiler: label -> duration samples with a summary table.

Port of Metal's PerformanceProfiler (BenchmarkUtilities.swift:577-607).
Also hosts the `--capture` hook: a jax.profiler trace (the
MTLCaptureManager / GPU-trace analog) wrapped so unsupported runtimes
degrade gracefully.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, List


class PerformanceProfiler:
    def __init__(self):
        self._samples: Dict[str, List[float]] = defaultdict(list)

    def record(self, label: str, seconds: float) -> None:
        self._samples[label].append(seconds)

    @contextlib.contextmanager
    def measure(self, label: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.record(label, time.perf_counter() - t0)

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for label, vals in self._samples.items():
            total = sum(vals)
            out[label] = {
                "count": len(vals),
                "total_ms": total * 1e3,
                "mean_ms": total / len(vals) * 1e3,
                "min_ms": min(vals) * 1e3,
                "max_ms": max(vals) * 1e3,
            }
        return out

    def print_summary(self) -> None:
        print(f"{'phase':<24} {'count':>6} {'total ms':>10} {'mean ms':>9}")
        for label, s in sorted(self.summary().items()):
            print(
                f"{label:<24} {s['count']:>6} {s['total_ms']:>10.3f} "
                f"{s['mean_ms']:>9.3f}"
            )

    def reset(self) -> None:
        self._samples.clear()


@contextlib.contextmanager
def capture_trace(trace_dir: str):
    """jax profiler trace if the runtime supports it (--capture)."""
    import jax

    started = False
    try:
        jax.profiler.start_trace(trace_dir)
        started = True
    except Exception as e:  # noqa: BLE001 - capability varies by runtime
        print(f"Warning: profiler capture unavailable: {e}")
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
                print(f"Profiler trace written to {trace_dir}")
            except Exception as e:  # noqa: BLE001
                print(f"Warning: profiler stop failed: {e}")
