"""Speed-of-light microbenchmark bodies: the measured denominators for
every roofline/%-of-peak number the suite publishes.

The reference reports raw GB/s (cuda/bench_base.cu:110-115) and leaves
"is that good?" to the reader; round 2's roofline divided by *spec-sheet
guesses* (Google publishes no VPU FLOP rate at all), which let a
benchmark report >100% of "peak". These five bodies measure the peaks
on the chip itself:

* ``fma_chain``      -- VPU f32 FMA throughput: k dependent FMA passes
                        over a VMEM-resident block, compute-bound by
                        construction (arithmetic intensity = k/4
                        FLOP/byte).
* ``fma_vmem``       -- VMEM pass rate: the same chain with the carry
                        forced through VMEM every pass (the wall
                        full-field stencil kernels actually hit).
* ``stream_scale``   -- HBM bandwidth: one read + one write pass over
                        an array far larger than VMEM.
* ``matmul_bf16``    -- MXU bf16 throughput (f32 accumulation via
                        ``preferred_element_type``), the headline TPU
                        number.
* ``matmul_f32``     -- delivered f32 matmul throughput at
                        ``Precision.HIGHEST`` (XLA lowers f32 matmuls
                        to multi-pass bf16 on TPU; this measures what
                        an f32 workload actually gets, which is the
                        rate f32 MXU work should be judged against).

The FMA chain y <- y*m + c composed k times has the closed form
y = x*m^k + c*(1-m^k)/(1-m), so the kernel is exactly validatable like
every other benchmark. Floating-point non-associativity keeps XLA from
algebraically collapsing the chain (it only reassociates under explicit
fast-math opt-ins, which jit does not set).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# FMA chain constants. m pulls toward the fixed point c/(1-m) = 2, so
# values stay O(1) at any chain length (no overflow, no denormals).
FMA_M = 0.9995
FMA_C = 0.001
# Unroll sweep on v5e (k=512, 32-row blocks): u8 = 4.19, u16 = 4.35,
# u64 = 4.51, u128 = 4.54, full unroll = 4.57 TFLOP/s. Chains up to
# _FULL_UNROLL are fully unrolled (no loop at all); longer chains run
# a fori_loop of _UNROLL-deep bodies (within 0.7% of full).
_FULL_UNROLL = 512
_UNROLL = 128


def fma_golden(x, k: int):
    """Closed-form float64 golden: x*m^k + c*(1-m^k)/(1-m)."""
    import numpy as np

    m = np.float64(np.float32(FMA_M))
    c = np.float64(np.float32(FMA_C))
    mk = m**k
    return (np.asarray(x, np.float64) * mk + c * (1.0 - mk) / (1.0 - m)).astype(
        np.float32
    )


def _fma_body(y, steps: int):
    m = jnp.float32(FMA_M)
    c = jnp.float32(FMA_C)

    if steps <= _FULL_UNROLL:
        for _ in range(steps):
            y = y * m + c
        return y

    def body(_, y):
        for _ in range(_UNROLL):
            y = y * m + c
        return y

    whole, rem = divmod(steps, _UNROLL)
    y = jax.lax.fori_loop(0, whole, body, y) if whole else y
    for _ in range(rem):
        y = y * m + c
    return y


def _fma_kernel(x_ref, o_ref, *, k: int):
    o_ref[...] = _fma_body(x_ref[...], k)


@functools.partial(jax.jit, static_argnames=("k",))
def fma_chain_pallas(x: jax.Array, k: int) -> jax.Array:
    """k FMA passes over (rows, 1024) f32, gridded in 32-row VMEM
    blocks. Block size measured on v5e (k=512, 8 MiB set): 256 rows =
    1.59 TFLOP/s, 64 = 3.40, 32 = 4.19, 16 = 4.13, 8 = 3.78 -- 32 rows
    (256 KiB working block) is the issue-rate sweet spot; larger blocks
    thrash VMEM between fori iterations, smaller ones under-fill the
    pipeline. Within a block each pass is 32 independent vreg FMAs, so
    the k-deep dependence chain never starves the VPU."""
    rows, width = x.shape
    block = min(32, rows)
    if rows % block or width % 128 or rows % 8:
        return fma_chain_xla(x, k)
    return pl.pallas_call(
        functools.partial(_fma_kernel, k=k),
        grid=(rows // block,),
        in_specs=[pl.BlockSpec((block, width), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((block, width), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
    )(x)


@functools.partial(jax.jit, static_argnames=("k",))
def fma_chain_xla(x: jax.Array, k: int) -> jax.Array:
    return _fma_body(x, k)


def _fma_vmem_kernel(x_ref, o_ref, *, k: int):
    m = jnp.float32(FMA_M)
    c = jnp.float32(FMA_C)
    o_ref[...] = jax.lax.fori_loop(
        0, k, lambda _, y: y * m + c, x_ref[...]
    )


@functools.partial(jax.jit, static_argnames=("k",))
def fma_vmem_pallas(x: jax.Array, k: int) -> jax.Array:
    """k FMA passes where the loop carry ROUND-TRIPS VMEM every pass:
    one un-unrolled fori_loop over the whole multi-MiB block (no grid).
    The array is far larger than the vector register file, so each
    iteration must stream the carry out of and back into VMEM -- by
    construction this measures the VMEM read+write pass rate (8 bytes
    per element per pass), NOT the FMA issue rate.

    This is the denominator for full-field stencil kernels (FDTD) and
    any loop whose carried state exceeds registers: fma_chain_pallas's
    32-row register-resident blocks measure the VPU's arithmetic peak,
    while real field kernels pay this wall instead. (The r3 block-size
    sweep first exposed the gap: 256-row blocks ran 2.9x slower than
    32-row ones purely from per-iteration VMEM carry traffic.)
    Same closed-form golden as the chain: identical per-pass math.
    """
    rows, width = x.shape
    if width % 128 or rows % 8:
        return fma_chain_xla(x, k)
    return pl.pallas_call(
        functools.partial(_fma_vmem_kernel, k=k),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
    )(x)


@jax.jit
def stream_scale(x: jax.Array) -> jax.Array:
    """One full read + write pass: y = 2x. XLA fuses this into a single
    HBM-streaming loop; no kernel needed to hit bandwidth."""
    return x * jnp.float32(2.0)


@jax.jit
def matmul_bf16(a: jax.Array, b: jax.Array) -> jax.Array:
    """bf16 x bf16 -> f32-accumulated matmul (the MXU's native rate)."""
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


@jax.jit
def matmul_f32(a: jax.Array, b: jax.Array) -> jax.Array:
    """f32 matmul at the framework's f32 operating precision
    (Precision.HIGH, the 3-pass bf16 product): the delivered f32-class
    rate the roofline judges f32 MXU workloads against. r5 A/B: HIGH
    is error-IDENTICAL to the 6-pass HIGHEST on the suite's f32 GEMMs
    (ops/neuralamp.py F32_GEMM_PRECISION table) at ~1.45x the rate, so
    HIGHEST's rate (30.9 TFLOP/s measured) understates what an f32
    workload can actually get. The denominator must match the
    numerator's precision class or %-of-peak lies in either direction.
    """
    return jnp.dot(
        a, b,
        precision=jax.lax.Precision.HIGH,
        preferred_element_type=jnp.float32,
    )


@jax.jit
def matmul_int8(a: jax.Array, b: jax.Array) -> jax.Array:
    """s8 x s8 -> s32-accumulated matmul: the MXU's integer rate (v5e
    spec 394 TOPS, 2x the bf16 FLOP rate). Exact in int32 for the
    operand magnitudes the SOL benchmark feeds it (|sum| < 2^31)."""
    return jnp.dot(a, b, preferred_element_type=jnp.int32)
