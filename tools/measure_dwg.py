"""Measure DWG1DNaive saturated ms/block on the TPU (round-2 arc kernel).

Usage: python tools/measure_dwg.py [n_waveguides ...]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from gpuaudiobench_tpu.config import BenchConfig
from gpuaudiobench_tpu.models.dwg import DWGBenchmark
from gpuaudiobench_tpu.ops.dwg_arc import dwg_block_arc

DEPTH = 32


def measure(n_wg: int) -> None:
    cfg = BenchConfig(n_tracks=n_wg, buffer_size=512, n_runs=3, warmup=1,
                      write_latencies=False, device_timing=False,
                      verification="full", impl="pallas")
    b = DWGBenchmark(cfg)
    b.setup()
    v = b.validate()
    print(f"[{n_wg} wg] n_long={b._n_long} validation passed={v.passed} "
          f"max_err={v.max_error:.3g}")

    c = b._consts
    n_long = b._n_long

    @jax.jit
    def stream(x, fwd, bwd):
        def step(carry, _):
            fwd, bwd = carry
            out, fwd, bwd = dwg_block_arc(
                x, fwd, bwd, c["lengths"], c["in_taps"], c["out_taps"],
                c["gains"], c["refl"], c["damp"], n_long=n_long)
            return (fwd, bwd), out[0]
        (fwd, bwd), outs = jax.lax.scan(step, (fwd, bwd), None, length=DEPTH)
        return outs, fwd, bwd

    x = b._resident_input
    fwd, bwd = b._resident_rails
    outs, f, _ = stream(x, fwd, bwd)
    _ = np.asarray(outs)  # honest-sync + compile

    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        outs, f2, b2 = stream(x, fwd, bwd)
        jax.block_until_ready(outs)
        best = min(best, (time.perf_counter() - t0) / DEPTH * 1e3)
    print(f"[{n_wg} wg] saturated {best:.3f} ms/block "
          f"(deadline 10.667, {'MEETS' if best < 10.667 else 'MISSES'})")


if __name__ == "__main__":
    for arg in (sys.argv[1:] or ["1024"]):
        measure(int(arg))
