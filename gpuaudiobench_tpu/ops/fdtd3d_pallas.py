"""Pallas TPU kernel for the 3-D FDTD room simulation.

The whole staggered grid (52^3 pressure + 3 velocity fields) fits
on-chip, so the entire bufferSize x stepsPerSample time loop runs inside
ONE kernel with the fields never leaving VMEM -- the logical endpoint of
the dispatch-granularity spectrum the reference spans (CUDA: 512 x 3 x
2+ launches with per-sample syncs, bench_fdtd3d.cu:384-438; Metal: one
command buffer, FDTD3DBenchmark.swift:408-480; here: one fused on-chip
loop).

Layout: every field is stored 2-D as (X, Y*Z) = (53, 53*53) with the
flattened (y, z) plane on the 128-wide lane axis. A native 3-D layout
keeps only 52 of 128 lanes busy (z pads to the lane width); the packed
plane uses 2809/2816 lanes. Stencil shifts become:
  x: sublane row shifts (concat with a zero row),
  y: lane rolls by Z_STRIDE (53),
  z: lane rolls by 1.
Roll wrap-around contamination only lands on padded or boundary cells,
which the interior/boundary masks exclude by construction. Source
injection and receiver taps are one-hot mask operations (Mosaic has no
scatter); per-sample src/rcv scalars live in SMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpuaudiobench_tpu.ops import fdtd3d as C

PAD_N = C.GRID_N + 1  # 53: fits every staggered extent (52 or 53)
PLANE = PAD_N * PAD_N  # 2809 lanes at the reference's room 50


def _pad_n(n: int) -> int:
    return n + 1


def _vmem_limit_bytes(pad_n: int, working_planes: int) -> int:
    """Mosaic scoped-VMEM budget for a kernel whose working set is
    ~`working_planes` (pad, pad*pad) f32 planes (carried fields +
    stencil temporaries).

    Mosaic's default scoped-VMEM limit is 16 MiB; v5e has 128 MiB of
    VMEM. At the reference room (50^3, 595 KiB planes) the default is
    ample, but the --fdtdRoom knob (WebGPU ParameterBuilder fdtdParams,
    10-100) scales planes cubically: room 80 was measured needing
    19.9 MiB and failing compile at the default. Request the measured
    working set plus ~35% headroom, clamped to just under the physical
    VMEM so oversized rooms still fail with a clear compiler error
    rather than silently thrashing.
    """
    plane = pad_n * pad_n * pad_n * 4  # (pad, pad*pad) f32
    want = working_planes * plane + (4 << 20)
    return max(16 << 20, min(127 << 20, want))


def _shift_down(a):
    """rows: out[k] = a[k-1], zero row at k=0 (x-1 shift)."""
    return jnp.concatenate([jnp.zeros((1, a.shape[1]), a.dtype), a[:-1]], axis=0)


def _shift_up(a):
    """rows: out[k] = a[k+1], zero row at the end (x+1 shift)."""
    return jnp.concatenate([a[1:], jnp.zeros((1, a.shape[1]), a.dtype)], axis=0)


def _roll_lanes(a, shift):
    """Circular lane roll; wrapped elements only reach masked cells."""
    return pltpu.roll(a, shift % a.shape[1], 1)


def _fdtd_kernel(src_ref, p_in, vx_in, vy_in, vz_in,
                 out_ref, p_out, vx_out, vy_out, vz_out,
                 *, buffer_size: int, steps_per_sample: int,
                 n: int = C.GRID_N, source: tuple = C.SOURCE,
                 receiver: tuple = C.RECEIVER):
    pad_n = _pad_n(n)
    k1 = jnp.float32(C.DT_OVER_RHO_DX)
    k2 = jnp.float32(C.RHO_C2_DT_OVER_DX)
    absorb = jnp.float32(1.0 - C.ABSORPTION)
    sx, sy, sz = source
    rx, ry, rz = receiver

    shape = (pad_n, pad_n * pad_n)
    x_i = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    y_i = lane // pad_n
    z_i = lane % pad_n

    valid = (x_i < n) & (y_i < n) & (z_i < n)
    edge = (
        (x_i == 0) | (x_i == n - 1) | (y_i == 0) | (y_i == n - 1)
        | (z_i == 0) | (z_i == n - 1)
    )
    interior_b = valid & ~edge
    boundary_b = valid & edge

    # Velocity interior masks (staggered index 1..n-1 on the staggered
    # axis, bench_fdtd3d.cu:26-56), premultiplied by dt/(rho*dx) so the
    # update is a single fused multiply-subtract per field.
    fmx = k1 * ((x_i >= 1) & (x_i <= n - 1) & (y_i < n) & (z_i < n)).astype(jnp.float32)
    fmy = k1 * ((y_i >= 1) & (y_i <= n - 1) & (x_i < n) & (z_i < n)).astype(jnp.float32)
    fmz = k1 * ((z_i >= 1) & (z_i <= n - 1) & (x_i < n) & (y_i < n)).astype(jnp.float32)

    src_mask = ((x_i == sx) & (y_i == sy) & (z_i == sz)).astype(jnp.float32)
    rcv_mask = ((x_i == rx) & (y_i == ry) & (z_i == rz)).astype(jnp.float32)

    # Pressure update as two fused multiply-adds instead of a
    # select chain: p' = p*p_scale - k2m*div, with p_scale = absorb on
    # boundary cells (1 elsewhere) and k2m = k2 on interior cells only.
    p_scale = jnp.where(boundary_b, absorb, jnp.float32(1.0))
    k2m = k2 * interior_b.astype(jnp.float32)

    def substep(_, fields):
        p, vx, vy, vz = fields
        vx = vx - fmx * (p - _shift_down(p))  # k1 premultiplied into masks
        vy = vy - fmy * (p - _roll_lanes(p, pad_n))
        vz = vz - fmz * (p - _roll_lanes(p, 1))
        div = (
            (_shift_up(vx) - vx)
            + (_roll_lanes(vy, -pad_n) - vy)
            + (_roll_lanes(vz, -1) - vz)
        )
        p = p * p_scale - k2m * div
        return (p, vx, vy, vz)

    def per_sample(smp, fields):
        p, vx, vy, vz = fields
        p = p + src_mask * src_ref[0, smp]  # soft source, one cell
        p, vx, vy, vz = jax.lax.fori_loop(
            0, steps_per_sample, substep, (p, vx, vy, vz)
        )
        out_ref[0, smp] = jnp.sum(rcv_mask * p) * jnp.float32(C.OUTPUT_SCALE)
        return (p, vx, vy, vz)

    fields = (p_in[...], vx_in[...], vy_in[...], vz_in[...])
    p, vx, vy, vz = jax.lax.fori_loop(0, buffer_size, per_sample, fields)
    p_out[...] = p
    vx_out[...] = vx
    vy_out[...] = vy
    vz_out[...] = vz


def _fdtd_kernel_div(src_ref, p_in, div_in,
                     out_ref, p_out, div_out,
                     *, buffer_size: int, steps_per_sample: int,
                     n: int = C.GRID_N, source: tuple = C.SOURCE,
                     receiver: tuple = C.RECEIVER):
    """Divergence-form state: carry (p, div(v)) instead of
    (p, vx, vy, vz).

    Substituting the velocity update into the divergence gives
        div' = div - sum_axis [ m_up*(p_+ - p) - m*(p - p_-) ]
    with static per-cell masks m = k1*(staggered-interior), m_up = m
    shifted one cell up the axis -- v never materializes. Two carried
    fields instead of four and one stencil instead of two, roughly
    halving the VMEM traffic per substep (5.1 -> 4.3 ms/block). Exact
    same update algebra as the field form, reassociated; equivalence-
    tested against it (tests/test_pallas_ops.py).
    """
    pad_n = _pad_n(n)
    k1 = jnp.float32(C.DT_OVER_RHO_DX)
    k2 = jnp.float32(C.RHO_C2_DT_OVER_DX)
    absorb = jnp.float32(1.0 - C.ABSORPTION)
    sx, sy, sz = source
    rx, ry, rz = receiver

    shape = (pad_n, pad_n * pad_n)
    x_i = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    y_i = lane // pad_n
    z_i = lane % pad_n

    valid = (x_i < n) & (y_i < n) & (z_i < n)
    edge = (
        (x_i == 0) | (x_i == n - 1) | (y_i == 0) | (y_i == n - 1)
        | (z_i == 0) | (z_i == n - 1)
    )
    interior_b = valid & ~edge
    boundary_b = valid & edge

    src_mask = ((x_i == sx) & (y_i == sy) & (z_i == sz)).astype(jnp.float32)

    p_scale = jnp.where(boundary_b, absorb, jnp.float32(1.0))
    k2m = k2 * interior_b.astype(jnp.float32)
    # Round-2 history: the first div-form kernel kept the staggered
    # per-axis masks as six premultiplied fm fields and ran
    #   div' = div + fmsum*p - sum_i fm_i * p_i
    # (seven mask-FMA passes; 4.34 -> 3.39 -> 2.70 ms with unrolling).
    # Homogeneous-interior form (round 3): div only ever feeds p through k2m,
    # which is zero outside interior cells, and an interior cell's six
    # neighbors are always valid cells with all staggered masks == k1
    # (roll wrap-around only lands on edge/padded lanes). So on every
    # cell that matters the masked update IS the unmasked one:
    #   div' = div + 6*k1*p - k1*(sum of 6 neighbors)
    # -- five adds and two FMAs with NO mask-field operands, instead of
    # seven mask-FMA passes each streaming a 582 KiB mask from VMEM.
    # div accumulates bounded junk on non-interior cells (linear, never
    # fed back); the block wrapper re-masks it once per block.
    c6 = jnp.float32(6.0) * k1

    def substep_hom(p, div):
        s = _shift_up(p) + _shift_down(p)
        s = s + (_roll_lanes(p, -pad_n) + _roll_lanes(p, pad_n))
        s = s + (_roll_lanes(p, -1) + _roll_lanes(p, 1))
        div = (div + c6 * p) - k1 * s
        p = p * p_scale - k2m * div
        return p, div

    def substep(_, fields):
        p, div = fields
        p, div = substep_hom(p, div)
        return (p, div)

    # Receiver tap: the cell index is static, so read it directly
    # instead of a full-field masked reduction per sample.
    rcv_lane = ry * pad_n + rz

    def per_sample(smp, fields):
        p, div = fields
        p = p + src_mask * src_ref[0, smp]
        # steps_per_sample is static; unrolling the 3 substeps lets
        # Mosaic schedule across their boundaries (3.39 -> 2.80 ms).
        for i in range(steps_per_sample):
            p, div = substep(i, (p, div))
        out_ref[0, smp] = p[rx, rcv_lane] * jnp.float32(C.OUTPUT_SCALE)
        return (p, div)

    fields0 = (p_in[...], div_in[...])
    # Unroll the sample loop too (4x: a further 2.80 -> 2.70 ms); the
    # largest of 4/2/1 that divides the block keeps odd sizes correct.
    unroll = 4 if buffer_size % 4 == 0 else (2 if buffer_size % 2 == 0 else 1)

    def chunk(i, fields):
        for j in range(unroll):
            fields = per_sample(unroll * i + j, fields)
        return fields

    p, div = jax.lax.fori_loop(0, buffer_size // unroll, chunk, fields0)
    p_out[...] = p
    # Re-mask the carried div once per block: the homogeneous substep
    # accumulates bounded junk on non-interior cells (never read back),
    # and this single pass per 512 samples keeps the carried state
    # bounded over indefinite streaming.
    div_out[...] = div * interior_b.astype(jnp.float32)


def _pack(a3, pad_n: int = PAD_N):
    """(X<=pad, Y<=pad, Z<=pad) field -> (pad, pad*pad) plane layout."""
    padded = jnp.zeros((pad_n, pad_n, pad_n), a3.dtype)
    padded = jax.lax.dynamic_update_slice(padded, a3, (0, 0, 0))
    return padded.reshape(pad_n, pad_n * pad_n)


def _unpack(a2, shape, pad_n: int = PAD_N):
    return a2.reshape(pad_n, pad_n, pad_n)[
        : shape[0], : shape[1], : shape[2]]


@functools.partial(
    jax.jit,
    static_argnames=("steps_per_sample", "source", "receiver"))
def fdtd3d_block_pallas(
    x: jax.Array,
    p: jax.Array,
    vx: jax.Array,
    vy: jax.Array,
    vz: jax.Array,
    steps_per_sample: int = C.STEPS_PER_SAMPLE,
    source: tuple = C.SOURCE,
    receiver: tuple = C.RECEIVER,
):
    """Same contract as ops.fdtd3d.fdtd3d_block; grid size rides
    p.shape (room + 2 ghost cells)."""
    tracks, s = x.shape
    n = p.shape[0]
    pad_n = _pad_n(n)
    src = (jnp.sum(x, axis=0) * jnp.float32(C.SOURCE_SCALE)).reshape(1, s)

    kernel = functools.partial(
        _fdtd_kernel, buffer_size=s, steps_per_sample=steps_per_sample,
        n=n, source=source, receiver=receiver,
    )
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)  # noqa: E731
    plane = jax.ShapeDtypeStruct((pad_n, pad_n * pad_n), jnp.float32)
    rcv, p_o, vx_o, vy_o, vz_o = pl.pallas_call(
        kernel,
        in_specs=[smem()] + [vmem() for _ in range(4)],
        out_specs=[smem()] + [vmem() for _ in range(4)],
        out_shape=[jax.ShapeDtypeStruct((1, s), x.dtype)] + [plane] * 4,
        # 4 carried fields + in/out copies + stencil temps; the div
        # form measured ~9 planes, this one carries 2 more fields.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit_bytes(pad_n, 18)),
    )(src, _pack(p, pad_n), _pack(vx, pad_n), _pack(vy, pad_n),
      _pack(vz, pad_n))
    out = jnp.broadcast_to(rcv, (tracks, s))
    return (
        out,
        _unpack(p_o, p.shape, pad_n),
        _unpack(vx_o, vx.shape, pad_n),
        _unpack(vy_o, vy.shape, pad_n),
        _unpack(vz_o, vz.shape, pad_n),
    )


def zero_fields_div(n: int = C.GRID_N):
    """(p, div) state for the divergence-form kernel (v starts at 0,
    so div(v) starts at 0)."""
    return (
        jnp.zeros((n, n, n), jnp.float32),
        jnp.zeros((n, n, n), jnp.float32),
    )


@functools.partial(
    jax.jit,
    static_argnames=("steps_per_sample", "source", "receiver"))
def fdtd3d_block_pallas_div(
    x: jax.Array,
    p: jax.Array,    # (N, N, N)
    div: jax.Array,  # (N, N, N) divergence of the velocity field
    steps_per_sample: int = C.STEPS_PER_SAMPLE,
    source: tuple = C.SOURCE,
    receiver: tuple = C.RECEIVER,
):
    """Divergence-form block: returns (out (tracks, S), p', div');
    grid size rides p.shape (room + 2 ghost cells)."""
    tracks, s = x.shape
    n = p.shape[0]
    pad_n = _pad_n(n)
    src = (jnp.sum(x, axis=0) * jnp.float32(C.SOURCE_SCALE)).reshape(1, s)

    kernel = functools.partial(
        _fdtd_kernel_div, buffer_size=s, steps_per_sample=steps_per_sample,
        n=n, source=source, receiver=receiver,
    )
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)  # noqa: E731
    plane = jax.ShapeDtypeStruct((pad_n, pad_n * pad_n), jnp.float32)
    rcv, p_o, div_o = pl.pallas_call(
        kernel,
        in_specs=[smem(), vmem(), vmem()],
        out_specs=[smem(), vmem(), vmem()],
        out_shape=[jax.ShapeDtypeStruct((1, s), x.dtype), plane, plane],
        # Measured working set at room 80: 19.9 MiB = ~8.7 planes
        # (2 carried fields + in/out + substep temporaries).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit_bytes(pad_n, 12)),
    )(src, _pack(p, pad_n), _pack(div, pad_n))
    out = jnp.broadcast_to(rcv, (tracks, s))
    return (out, _unpack(p_o, p.shape, pad_n),
            _unpack(div_o, div.shape, pad_n))
