"""speedoflight category: on-chip measurement of the roofline peaks.

Five microbenchmarks whose *achieved rates ARE the denominators* for
every %-of-peak number the suite reports (utils/roofline.py): VPU f32
FMA, VMEM round-trip pass rate, HBM stream, MXU bf16 matmul,
delivered-f32 matmul. They run
through the exact same harness as every workload benchmark (warmup,
timed round trips, xplane device timing, saturated pass, validation
against a closed-form or BLAS golden), so the calibration numbers carry
the same evidence standard as the numbers they calibrate.

Reference analog: the raw GB/s throughput fields of
cuda/bench_base.cu:110-115 — extended here to the measured-peak
discipline the reference never had. ``tools/calibrate_peaks.py`` runs
these on hardware and persists the peaks for roofline use.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from gpuaudiobench_tpu.config import BenchConfig
from gpuaudiobench_tpu.harness.base import Benchmark
from gpuaudiobench_tpu.harness.validation import (
    ValidationData,
    compare_abs,
    compare_rel,
)
from gpuaudiobench_tpu.utils import device as dev
from gpuaudiobench_tpu.utils.data import generate_random_audio

_WIDTH = 1024  # lane-dimension of the 2D working sets (8 f32 tiles)


class _SolBenchmark(Benchmark):
    """Shared scaffolding: single-chip microbenchmarks (peaks are
    per-chip quantities; --dataParallel is rejected, not ignored)."""

    def __init__(self, cfg: BenchConfig):
        super().__init__(cfg)
        self.host_output = None
        self.golden = None

    def _reject_dp(self) -> None:
        self.reject_data_parallel(
            f"{self.name} measures single-chip peaks; --dataParallel "
            "does not apply (use ICIBandwidth for the interconnect)"
        )

    def validate(self) -> ValidationData:
        return compare_abs(
            self.host_output, self.golden, self.tolerance,
            mode=self.cfg.verification, limit=self.cfg.spot_sample_limit,
            label=self.name,
        )


class SolVpuFmaBenchmark(_SolBenchmark):
    """VPU f32 FMA throughput: k chained y = y*m + c passes over a
    VMEM-blocked array (ops/speedoflight.fma_chain_*). Validated
    against the closed form x*m^k + c*(1-m^k)/(1-m)."""

    name = "SOL_VPU"
    # One f32 rounding per FMA accumulates ~k*eps on O(1) values.
    tolerance = 5e-4

    def _working_mib(self) -> int:
        return self.cfg.sol_fma_mib

    def _pick_fn(self):
        """(fn, impl_used). Subclasses swap the Pallas body."""
        from gpuaudiobench_tpu.ops.speedoflight import (
            fma_chain_pallas,
            fma_chain_xla,
        )

        if self.resolve_impl() == "pallas":
            return fma_chain_pallas, "pallas"
        return fma_chain_xla, "xla"

    def setup(self) -> None:
        self._reject_dp()
        from gpuaudiobench_tpu.ops.speedoflight import fma_golden

        self.k = self.cfg.sol_fma_k
        rows = max(8, self._working_mib() * (1024 * 1024 // 4) // _WIDTH)
        self.host_input = generate_random_audio(
            rows * _WIDTH, self.cfg.seed
        ).reshape(rows, _WIDTH)
        self._resident = dev.to_device(self.host_input)
        self.golden = fma_golden(self.host_input, self.k)
        self.track_alloc("fmaBuffer", self.host_input.nbytes * 2)
        self._fn, self._impl_used = self._pick_fn()
        self.iterate()

    def iterate(self) -> None:
        x = dev.to_device(self.host_input)
        self.host_output = dev.from_device(self._fn(x, self.k))

    def device_iterate(self) -> None:
        dev.block(self._fn(self._resident, self.k))

    def stream_body(self):
        from gpuaudiobench_tpu.harness.streaming import barrier_chain

        fn, k = self._fn, self.k
        return barrier_chain(lambda x: fn(x, k), self._resident)

    def total_elements(self) -> int:
        return self.host_input.size

    def bytes_processed(self) -> int:
        return self.host_input.nbytes * 2

    def cost_model(self):
        n = self.host_input.size
        return {
            "flops": 2 * self.k * n,
            "hbm_bytes": 2 * n * 4,
            "unit": "vpu",
            "note": f"FMA chain k={self.k}; this measurement IS the vpu peak",
        }

    def metadata(self) -> Dict[str, Any]:
        return {"fmaK": self.k, "workingSetMiB": self.cfg.sol_fma_mib}


class SolVmemBenchmark(SolVpuFmaBenchmark):
    """VMEM round-trip pass rate: the SOL_VPU chain with the loop carry
    forced through VMEM every pass (ops/speedoflight.fma_vmem_pallas --
    one un-unrolled fori_loop over a multi-MiB block). Each pass moves
    8 bytes/element through VMEM; the achieved byte rate is the ceiling
    for full-field stencil kernels (FDTD) whose state exceeds the
    register file. Same closed-form golden, harness, and run shape as
    SOL_VPU (subclass); only the kernel body and the working-set knob
    differ.

    IMPORTANT measurement contract: only the Pallas body measures VMEM
    traffic. The XLA fallback (used off-TPU so validation still runs
    everywhere) computes the same VALUES but keeps the carry register/
    cache-resident -- its rate is NOT a VMEM rate, so metadata records
    ``impl`` and tools/calibrate_peaks.py refuses to persist a vmem
    peak from the fallback.
    """

    name = "SOL_VMEM"

    def _working_mib(self) -> int:
        return self.cfg.sol_vmem_mib

    def _pick_fn(self):
        from gpuaudiobench_tpu.ops.speedoflight import (
            fma_chain_xla,
            fma_vmem_pallas,
        )

        if self.resolve_impl() == "pallas":
            return fma_vmem_pallas, "pallas"
        return fma_chain_xla, "xla"

    def cost_model(self):
        n = self.host_input.size
        return {
            "flops": 2 * self.k * n,
            "hbm_bytes": 2 * n * 4,
            # one read + one write of the carry per pass
            "vmem_bytes": self.k * 8 * n,
            "unit": "vpu",
            "note": f"VMEM-carried FMA chain k={self.k}; this "
                    "measurement IS the vmem peak"
                    + ("" if self._impl_used == "pallas" else
                       " (xla fallback: NOT a vmem measurement)"),
        }

    def metadata(self) -> Dict[str, Any]:
        return {"fmaK": self.k, "workingSetMiB": self.cfg.sol_vmem_mib,
                "impl": self._impl_used}


class SolHbmStreamBenchmark(_SolBenchmark):
    """HBM bandwidth: one read + one write pass (y = 2x) over an array
    far larger than VMEM (ops/speedoflight.stream_scale)."""

    name = "SOL_HBM"
    tolerance = 0.0  # 2x is exact in f32

    def setup(self) -> None:
        self._reject_dp()
        rows = max(8, self.cfg.sol_stream_mib * (1024 * 1024 // 4) // _WIDTH)
        self.host_input = generate_random_audio(
            rows * _WIDTH, self.cfg.seed
        ).reshape(rows, _WIDTH)
        self._resident = dev.to_device(self.host_input)
        self.golden = (self.host_input * np.float32(2.0)).astype(np.float32)
        self.track_alloc("streamBuffer", self.host_input.nbytes * 2)
        self.iterate()

    def iterate(self) -> None:
        from gpuaudiobench_tpu.ops.speedoflight import stream_scale

        x = dev.to_device(self.host_input)
        self.host_output = dev.from_device(stream_scale(x))

    def device_iterate(self) -> None:
        from gpuaudiobench_tpu.ops.speedoflight import stream_scale

        dev.block(stream_scale(self._resident))

    def stream_body(self):
        from gpuaudiobench_tpu.harness.streaming import barrier_chain
        from gpuaudiobench_tpu.ops.speedoflight import stream_scale

        return barrier_chain(stream_scale, self._resident)

    def total_elements(self) -> int:
        return self.host_input.size

    def bytes_processed(self) -> int:
        return self.host_input.nbytes * 2

    def cost_model(self):
        n = self.host_input.size
        return {
            "flops": n,
            "hbm_bytes": 2 * n * 4,
            "unit": "vpu",
            "note": "read+write stream; this measurement IS the hbm peak",
        }

    def metadata(self) -> Dict[str, Any]:
        return {"streamMiB": self.cfg.sol_stream_mib}


class SolMxuBenchmark(_SolBenchmark):
    """MXU matmul throughput, d x d x d square (ops/speedoflight
    matmul_bf16 / matmul_f32). bf16 is the MXU's native rate; f32 is
    the delivered rate at the framework's f32 operating precision
    (Precision.HIGH, ops/neuralamp.py F32_GEMM_PRECISION)."""

    def __init__(self, cfg: BenchConfig, dtype: str):
        super().__init__(cfg)
        self.dtype = dtype
        self.name = f"SOL_MXU_{dtype}"
        # bf16 inputs: products are exact in f32; accumulation of d
        # f32 roundings vs the f32 BLAS golden stays ~sqrt(d)*eps.
        # int8 is EXACT (s32 accumulation never rounds and never
        # overflows at |operands| <= 127, d <= 4096: |sum| < 2^31).
        # f32 tolerance follows from the precision class and d: HIGH's
        # 3-pass products carry ~2^-16 relative error, and a K-term
        # random-sign accumulation walks ~sqrt(K) of it -- 1.5e-5 *
        # sqrt(4096) ~ 1e-3 one-sigma at the default dim (measured
        # tail: 4/1025 spot samples past 1e-3, max diff 1.8e-3, r5
        # calibration). 5 sigma = 5e-3 passes the correct kernel and
        # still fails hard on a genuinely wrong one (single-pass bf16
        # products would walk ~0.1). The AUDIO f32 contract (1e-4) is
        # unaffected: its GEMMs contract K <= 129, where HIGH measured
        # error-identical to HIGHEST (F32_GEMM_PRECISION A/B table).
        if dtype == "int8":
            self.tolerance = 1e-9
        elif dtype == "f32":
            d = cfg.sol_matmul_dim
            self.tolerance = 5 * (2.0 ** -16) * (d ** 0.5)
        else:
            self.tolerance = 1e-3

    def setup(self) -> None:
        self._reject_dp()
        import jax.numpy as jnp

        from gpuaudiobench_tpu.ops.speedoflight import (
            matmul_bf16,
            matmul_f32,
            matmul_int8,
        )

        d = self.cfg.sol_matmul_dim
        a = generate_random_audio(d * d, self.cfg.seed).reshape(d, d)
        b = generate_random_audio(d * d, self.cfg.seed + 1).reshape(d, d)
        if self.dtype == "bf16":
            # Inputs live as bf16 on host AND device: casting inside the
            # timed body costs two extra full passes and doubles the
            # input HBM reads (measured: 94.9 -> 186 TFLOP/s at d=2048
            # once the casts left the body). Golden sees the same
            # rounded values the MXU does.
            a = np.asarray(jnp.asarray(a, jnp.bfloat16))
            b = np.asarray(jnp.asarray(b, jnp.bfloat16))
            self._fn = matmul_bf16
        elif self.dtype == "int8":
            # Full-range int8 operands (the pre-cast discipline of the
            # bf16 case: quantization happens at setup, never in the
            # timed body).
            a = np.clip(np.round(a * 127.0), -127, 127).astype(np.int8)
            b = np.clip(np.round(b * 127.0), -127, 127).astype(np.int8)
            self._fn = matmul_int8
        else:
            self._fn = matmul_f32
        self.host_a, self.host_b = a, b
        self._ra = dev.to_device(a)
        self._rb = dev.to_device(b)
        if self.dtype == "int8":
            # Exact integer golden; f64 holds it exactly (< 2^53).
            g = a.astype(np.int64) @ b.astype(np.int64)
            assert int(np.abs(g).max()) < 2**31
            self.golden = g.astype(np.float64)
        else:
            # f32 BLAS golden (bf16 inputs upcast: products f32-exact).
            self.golden = (
                a.astype(np.float32) @ b.astype(np.float32)
            ).astype(np.float32)
        self.track_alloc("matmulA", a.nbytes)
        self.track_alloc("matmulB", b.nbytes)
        self.track_alloc("matmulOut", d * d * 4)
        self.iterate()

    def iterate(self) -> None:
        a = dev.to_device(self.host_a)
        b = dev.to_device(self.host_b)
        self.host_output = dev.from_device(self._fn(a, b))

    def device_iterate(self) -> None:
        dev.block(self._fn(self._ra, self._rb))

    def stream_body(self):
        from gpuaudiobench_tpu.harness.streaming import barrier_chain

        return barrier_chain(self._fn, self._ra, self._rb)

    def validate(self) -> ValidationData:
        # Relative with a zero-crossing floor: entries are sums of d
        # O(1) terms, so |golden| spans orders of magnitude.
        floor = self.tolerance * float(np.abs(self.golden).max() or 1.0)
        return compare_rel(
            self.host_output, self.golden, self.tolerance,
            mode=self.cfg.verification, limit=self.cfg.spot_sample_limit,
            label=self.name, floor=floor,
        )

    def total_elements(self) -> int:
        return self.cfg.sol_matmul_dim ** 2

    _IN_BYTES = {"bf16": 2, "int8": 1, "f32": 4}
    _UNIT = {"bf16": "mxu_bf16", "int8": "mxu_int8", "f32": "mxu"}

    def transfer_model(self):
        """iterate() uploads BOTH operands and reads one output back."""
        d = self.cfg.sol_matmul_dim
        in_bytes = self._IN_BYTES[self.dtype]
        return {"h2d_bytes": 2 * d * d * in_bytes, "d2h_bytes": d * d * 4}

    def bytes_processed(self) -> int:
        d = self.cfg.sol_matmul_dim
        return 2 * d * d * self._IN_BYTES[self.dtype] + d * d * 4

    def cost_model(self):
        d = self.cfg.sol_matmul_dim
        return {
            "flops": 2 * d**3,
            "hbm_bytes": self.bytes_processed(),
            "unit": self._UNIT[self.dtype],
            "note": f"{d}^3 {self.dtype} matmul; this measurement IS "
                    "the mxu peak",
        }

    def metadata(self) -> Dict[str, Any]:
        return {"matmulDim": self.cfg.sol_matmul_dim, "dtype": self.dtype}
