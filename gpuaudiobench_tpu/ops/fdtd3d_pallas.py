"""Pallas TPU kernel for the 3-D FDTD room simulation.

The whole staggered grid (52^3 pressure + 3 velocity fields, ~6 MB in
VMEM tiling) fits on-chip, so the entire bufferSize x stepsPerSample
time loop runs inside ONE kernel with the fields never leaving VMEM --
the logical endpoint of the dispatch-granularity spectrum the reference
spans (CUDA: 512 x 3 x 2+ launches with per-sample syncs,
bench_fdtd3d.cu:384-438; Metal: one command buffer,
FDTD3DBenchmark.swift:408-480; here: one fused on-chip loop).

Stencils are expressed as shifted-slice arithmetic on VMEM-resident
values (lane axis = z). Source injection and receiver taps are scalar
dynamic updates/reads once per sample.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpuaudiobench_tpu.ops import fdtd3d as C


def _fdtd_kernel(src_ref, p_in, vx_in, vy_in, vz_in,
                 out_ref, p_out, vx_out, vy_out, vz_out,
                 *, buffer_size: int, steps_per_sample: int):
    n = p_in.shape[0]
    k1 = jnp.float32(C.DT_OVER_RHO_DX)
    k2 = jnp.float32(C.RHO_C2_DT_OVER_DX)
    absorb = jnp.float32(1.0 - C.ABSORPTION)
    sx, sy, sz = C.SOURCE
    rx, ry, rz = C.RECEIVER

    ix = jax.lax.broadcasted_iota(jnp.int32, (n, n, n), 0)
    iy = jax.lax.broadcasted_iota(jnp.int32, (n, n, n), 1)
    iz = jax.lax.broadcasted_iota(jnp.int32, (n, n, n), 2)
    boundary = (
        (ix == 0) | (ix == n - 1) | (iy == 0) | (iy == n - 1)
        | (iz == 0) | (iz == n - 1)
    )
    src_mask = ((ix == sx) & (iy == sy) & (iz == sz)).astype(jnp.float32)
    rcv_mask = ((ix == rx) & (iy == ry) & (iz == rz)).astype(jnp.float32)

    # Staggered-face interior masks on the velocity grids (index 1..n-1).
    def face_mask(shape, axis):
        i = jax.lax.broadcasted_iota(jnp.int32, shape, axis)
        return ((i >= 1) & (i <= n - 1)).astype(jnp.float32)

    mx = face_mask((n + 1, n, n), 0)
    my = face_mask((n, n + 1, n), 1)
    mz = face_mask((n, n, n + 1), 2)

    def pad1(a, axis):
        """Zero-pad one plane on each side of `axis` (slice-free
        formulation: Mosaic has no scatter-add, so velocity updates are
        masked full-grid adds of padded pressure differences)."""
        cfgs = [(0, 0, 0)] * 3
        cfgs[axis] = (1, 1, 0)
        return jax.lax.pad(a, jnp.float32(0), cfgs)

    def substep(_, fields):
        p, vx, vy, vz = fields
        # vx[k] -= k1*(p[k] - p[k-1]) for k in 1..n-1, via padded shifts.
        vx = vx - k1 * mx * (pad1(p, 0)[1:, :, :] - pad1(p, 0)[:-1, :, :])[
            : n + 1, :, :]
        vy = vy - k1 * my * (pad1(p, 1)[:, 1:, :] - pad1(p, 1)[:, :-1, :])[
            :, : n + 1, :]
        vz = vz - k1 * mz * (pad1(p, 2)[:, :, 1:] - pad1(p, 2)[:, :, :-1])[
            :, :, : n + 1]
        div = (
            (vx[1:, :, :] - vx[:-1, :, :])
            + (vy[:, 1:, :] - vy[:, :-1, :])
            + (vz[:, :, 1:] - vz[:, :, :-1])
        )
        p = jnp.where(boundary, p * absorb, p - k2 * div)
        return (p, vx, vy, vz)

    def per_sample(smp, fields):
        p, vx, vy, vz = fields
        p = p + src_mask * src_ref[0, smp]  # soft source, one cell
        p, vx, vy, vz = jax.lax.fori_loop(
            0, steps_per_sample, substep, (p, vx, vy, vz)
        )
        rcv = jnp.sum(rcv_mask * p) * jnp.float32(C.OUTPUT_SCALE)
        out_ref[0, smp] = rcv
        return (p, vx, vy, vz)

    fields = (p_in[...], vx_in[...], vy_in[...], vz_in[...])
    p, vx, vy, vz = jax.lax.fori_loop(0, buffer_size, per_sample, fields)
    p_out[...] = p
    vx_out[...] = vx
    vy_out[...] = vy
    vz_out[...] = vz


@functools.partial(jax.jit, static_argnames=("steps_per_sample",))
def fdtd3d_block_pallas(
    x: jax.Array,
    p: jax.Array,
    vx: jax.Array,
    vy: jax.Array,
    vz: jax.Array,
    steps_per_sample: int = C.STEPS_PER_SAMPLE,
):
    """Same contract as ops.fdtd3d.fdtd3d_block."""
    tracks, s = x.shape
    src = (jnp.sum(x, axis=0) * jnp.float32(C.SOURCE_SCALE)).reshape(1, s)

    kernel = functools.partial(
        _fdtd_kernel, buffer_size=s, steps_per_sample=steps_per_sample
    )
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)  # noqa: E731
    # src/receiver taps are per-sample scalars with dynamic indices ->
    # SMEM, where scalar loads/stores are native.
    rcv, p_o, vx_o, vy_o, vz_o = pl.pallas_call(
        kernel,
        in_specs=[smem()] + [vmem() for _ in range(4)],
        out_specs=[smem()] + [vmem() for _ in range(4)],
        out_shape=[
            jax.ShapeDtypeStruct((1, s), x.dtype),
            jax.ShapeDtypeStruct(p.shape, p.dtype),
            jax.ShapeDtypeStruct(vx.shape, vx.dtype),
            jax.ShapeDtypeStruct(vy.shape, vy.dtype),
            jax.ShapeDtypeStruct(vz.shape, vz.dtype),
        ],
        input_output_aliases={1: 1, 2: 2, 3: 3, 4: 4},
    )(src, p, vx, vy, vz)
    out = jnp.broadcast_to(rcv, (tracks, s))
    return out, p_o, vx_o, vy_o, vz_o
