"""Biquad IIR filter: per-track Direct Form II recurrence.

TPU-native equivalent of IIRFilterKernel (cuda/bench_iir.cu:10-44): the
reference runs one CUDA thread per track, each sequentially looping over
the buffer. On TPU the recurrence order is preserved but vectorized the
other way: the *time* axis is the sequential scan and all tracks advance
in lockstep as full vector lanes.

  w[n] = x[n] - a1*w[n-1] - a2*w[n-2]
  y[n] = b0*w[n] + b1*w[n-1] + b2*w[n-2]

State (z1, z2) = (w[n-1], w[n-2]) per track round-trips across calls
exactly like the reference's persistent d_state (bench_iir.cu:19-43).

Two implementations:
* xla: lax.scan over the sample axis on a (S, T) transposed block.
* pallas: a single TPU kernel with tracks on the lane axis, time as an
  in-kernel fori_loop, state carried in VMEM -- one kernel launch per
  block instead of S dependent HLO loop iterations.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.partial(jax.jit, static_argnames=())
def iir_biquad_xla(x: jax.Array, coeffs: jax.Array, state: jax.Array):
    """x: (tracks, S) track-major; coeffs: (5,) = b0,b1,b2,a1,a2;
    state: (tracks, 2) = z1,z2. Returns (y, new_state)."""
    b0, b1, b2, a1, a2 = (coeffs[i] for i in range(5))
    xt = x.T  # (S, T): each scan step consumes one full lane-vector of tracks

    def step(carry, xn):
        z1, z2 = carry
        w = xn - a1 * z1 - a2 * z2
        y = b0 * w + b1 * z1 + b2 * z2
        return (w, z1), y

    (z1, z2), yt = jax.lax.scan(step, (state[:, 0], state[:, 1]), xt, unroll=8)
    return yt.T, jnp.stack([z1, z2], axis=1)


def _iir_kernel(x_ref, c_ref, z_ref, y_ref, zout_ref):
    """Pallas kernel: x (S, Tb) sample-major block, tracks on lanes.

    c_ref: (1, 8) SMEM-hosted coefficient row (b0,b1,b2,a1,a2,pad...).
    z_ref/zout_ref: (2, Tb) state rows.
    """
    b0 = c_ref[0, 0]
    b1 = c_ref[0, 1]
    b2 = c_ref[0, 2]
    a1 = c_ref[0, 3]
    a2 = c_ref[0, 4]
    s = x_ref.shape[0]

    def body(n, carry):
        z1, z2 = carry
        xn = x_ref[n, :]
        w = xn - a1 * z1 - a2 * z2
        y_ref[n, :] = b0 * w + b1 * z1 + b2 * z2
        return (w, z1)

    # 8x sample unroll: the body is ~4 vector ops on one vreg, so loop
    # overhead dominates (0.0076 -> 0.0052 ms/block at 128 tracks).
    unroll = 8 if s % 8 == 0 else 1

    def chunk(i, carry):
        for j in range(unroll):
            carry = body(unroll * i + j, carry)
        return carry

    z1, z2 = jax.lax.fori_loop(0, s // unroll, chunk,
                               (z_ref[0, :], z_ref[1, :]))
    zout_ref[0, :] = z1
    zout_ref[1, :] = z2


@functools.partial(jax.jit, static_argnames=("track_block",))
def iir_biquad_pallas(
    x: jax.Array, coeffs: jax.Array, state: jax.Array, track_block: int = 512
):
    """Pallas TPU path. x: (tracks, S); state: (tracks, 2)."""
    tracks, s = x.shape
    tb = min(track_block, tracks)
    if tracks % tb != 0:
        # Fall back: pad tracks to a lane-friendly multiple.
        pad = (-tracks) % tb
        xp = jnp.pad(x, ((0, pad), (0, 0)))
        sp = jnp.pad(state, ((0, pad), (0, 0)))
        y, z = iir_biquad_pallas(xp, coeffs, sp, track_block=tb)
        return y[:tracks], z[:tracks]

    xt = x.T  # (S, T)
    zt = state.T  # (2, T)
    c = jnp.pad(coeffs, (0, 3)).reshape(1, 8)

    grid = (tracks // tb,)
    y, zout = pl.pallas_call(
        _iir_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((s, tb), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, tb), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((s, tb), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, tb), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((s, tracks), x.dtype),
            jax.ShapeDtypeStruct((2, tracks), x.dtype),
        ],
    )(xt, c, zt)
    return y.T, zout.T


def iir_biquad(x, coeffs, state, impl: str = "xla"):
    if impl == "pallas":
        return iir_biquad_pallas(x, coeffs, state)
    return iir_biquad_xla(x, coeffs, state)


def _iir_cascade_kernel(x_ref, c_ref, z_ref, y_ref, zout_ref, *, n_stages: int):
    """Cascade of n_stages DF-II biquads in one pass over the samples
    (the BiquadChain workload, kernels_extra.metal:16-67): all 2K state
    vectors stay in registers; each sample flows through every stage
    before the next sample starts -- one kernel for the whole chain
    instead of K chained scans."""
    s = x_ref.shape[0]

    def body(n, carry):
        zs = list(carry)
        v = x_ref[n, :]
        for k in range(n_stages):
            b0 = c_ref[k, 0]
            b1 = c_ref[k, 1]
            b2 = c_ref[k, 2]
            a1 = c_ref[k, 3]
            a2 = c_ref[k, 4]
            z1, z2 = zs[2 * k], zs[2 * k + 1]
            w = v - a1 * z1 - a2 * z2
            v = b0 * w + b1 * z1 + b2 * z2
            zs[2 * k] = w
            zs[2 * k + 1] = z1
        y_ref[n, :] = v
        return tuple(zs)

    init = tuple(z_ref[i, :] for i in range(2 * n_stages))
    final = jax.lax.fori_loop(0, s, body, init)
    for i in range(2 * n_stages):
        zout_ref[i, :] = final[i]


def _iir_cascade_kernel_systolic(x_ref, c_ref, z_ref, y_ref, zout_ref,
                                 *, n_stages: int):
    """Systolic-skew cascade: at step t, stage k processes sample
    t - k, so all K stages advance IN PARALLEL on consecutive samples
    instead of each sample flowing through K dependent stages. The
    5120-long dependency chain of the per-sample form (512 samples x
    10 stages) becomes S + K - 1 = 521 steps of one vectorized biquad
    update over the (K, tracks) stage plane -- the recurrence-latency
    floor of a single biquad, not of the chain.

    A per-stage activity mask (k <= t < S + k) freezes each stage's
    state outside its window: during warmup (t < k) a stage sees
    garbage from its upstream neighbor but discards it, and during
    drain (t >= S + k) it stops updating, so the carried states land
    exactly where the per-sample form leaves them. Same arithmetic per
    (sample, stage) as the chain kernel (agreement to FMA-contraction
    rounding, ~1e-7; tests/test_pallas_ops.py).
    """
    s = x_ref.shape[0]
    k = n_stages
    b0 = c_ref[:, 0:1]
    b1 = c_ref[:, 1:2]
    b2 = c_ref[:, 2:3]
    a1 = c_ref[:, 3:4]
    a2 = c_ref[:, 4:5]
    tracks = x_ref.shape[1]
    stage = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)

    def body(t, carry):
        z1, z2, ylast = carry  # (K, T) each
        n = t - stage  # sample index per stage
        live = ((n >= 0) & (n < s)).astype(jnp.float32)  # (K, 1)
        xin = x_ref[jnp.minimum(t, s - 1), :]
        v = jnp.concatenate([xin[None, :], ylast[:-1]], axis=0)
        w = v - a1 * z1 - a2 * z2
        y = b0 * w + b1 * z1 + b2 * z2

        @pl.when((t >= k - 1) & (t - (k - 1) < s))
        def _():
            y_ref[t - (k - 1), :] = y[k - 1]

        dead = 1.0 - live
        return (live * w + dead * z1, live * z1 + dead * z2, y)

    z1_0 = z_ref[:k, :]
    z2_0 = z_ref[k:, :]
    y0 = jnp.zeros((k, tracks), jnp.float32)
    # Unrolled steps, padded up to a multiple of 8: the pad steps have
    # every stage dead (live = 0) so states freeze, and the write guard
    # caps the output window.
    total = s + k - 1
    # Swept on v5e at S=512 (10 stages, 128 trk, 4096-block chained
    # scan): unroll 8 -> 21.4 us/block, 16 -> 18.3, 32 -> 17.0,
    # 64 -> 16.5; bit-exact at every setting (same per-step op order).
    # Small (low-latency) blocks cap the unroll so dead pad steps stay
    # <= 25% of the real work: at S=32/k=10 (total 41) a flat 64 would
    # pad 56% dead steps; 16 pads 17%.
    unroll = 64
    while unroll > 8 and (-total % unroll) * 4 > total:
        unroll //= 2
    padded = -(-total // unroll) * unroll

    def chunk(i, carry):
        for j in range(unroll):
            carry = body(unroll * i + j, carry)
        return carry

    z1f, z2f, _ = jax.lax.fori_loop(0, padded // unroll, chunk,
                                    (z1_0, z2_0, y0))
    zout_ref[:k, :] = z1f
    zout_ref[k:, :] = z2f


@functools.partial(jax.jit, static_argnames=("track_block",))
def iir_cascade_pallas(
    x: jax.Array,  # (tracks, S)
    coeffs: jax.Array,  # (K, 5)
    states: jax.Array,  # (K, tracks, 2)
    track_block: int = 512,
):
    """K-stage biquad cascade via the systolic kernel.
    Returns (y (tracks, S), states')."""
    k = coeffs.shape[0]
    tracks, s = x.shape
    tb = min(track_block, tracks)
    if tracks % tb != 0:
        pad = (-tracks) % tb
        xp = jnp.pad(x, ((0, pad), (0, 0)))
        sp = jnp.pad(states, ((0, 0), (0, pad), (0, 0)))
        y, z = iir_cascade_pallas(xp, coeffs, sp, track_block=tb)
        return y[:tracks], z[:, :tracks]

    xt = x.T  # (S, T)
    # (2K, T): z1 for every stage, then z2 for every stage.
    zt = jnp.concatenate([states[:, :, 0], states[:, :, 1]], axis=0)
    c = jnp.pad(coeffs, ((0, 0), (0, 3)))  # (K, 8)

    kernel = functools.partial(_iir_cascade_kernel_systolic, n_stages=k)
    grid = (tracks // tb,)
    y, zout = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((s, tb), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * k, tb), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((s, tb), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * k, tb), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((s, tracks), x.dtype),
            jax.ShapeDtypeStruct((2 * k, tracks), x.dtype),
        ],
    )(xt, c, zt)
    return y.T, jnp.stack([zout[:k], zout[k:]], axis=2)


@functools.partial(jax.jit, static_argnames=("track_block",))
def iir_cascade_pallas_chain(
    x: jax.Array,  # (tracks, S)
    coeffs: jax.Array,  # (K, 5)
    states: jax.Array,  # (K, tracks, 2)
    track_block: int = 512,
):
    """Per-sample chain form of the cascade (each sample flows through
    every stage before the next starts). Kept as the bit-exactness
    oracle for the systolic kernel."""
    k = coeffs.shape[0]
    tracks, s = x.shape
    tb = min(track_block, tracks)
    if tracks % tb != 0:
        pad = (-tracks) % tb
        xp = jnp.pad(x, ((0, pad), (0, 0)))
        sp = jnp.pad(states, ((0, 0), (0, pad), (0, 0)))
        y, z = iir_cascade_pallas(xp, coeffs, sp, track_block=tb)
        return y[:tracks], z[:, :tracks]

    xt = x.T  # (S, T)
    zt = states.transpose(0, 2, 1).reshape(2 * k, tracks)  # (2K, T)
    c = jnp.pad(coeffs, ((0, 0), (0, 3)))  # (K, 8)

    kernel = functools.partial(_iir_cascade_kernel, n_stages=k)
    grid = (tracks // tb,)
    y, zout = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((s, tb), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * k, tb), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((s, tb), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * k, tb), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((s, tracks), x.dtype),
            jax.ShapeDtypeStruct((2 * k, tracks), x.dtype),
        ],
    )(xt, c, zt)
    return y.T, zout.reshape(k, 2, tracks).transpose(0, 2, 1)


# -- block-state form: the recurrence advanced m samples per step ------------
#
# The biquad is LINEAR, so the per-sample dependency chain is not
# fundamental: with s[n] = (w[n], w[n-1]) and A = [[-a1, -a2], [1, 0]],
#
#   s[n] = A s[n-1] + (x[n], 0)
#   w[n0+j] = (A^{j+1} s_prev)[0] + sum_{i<=j} p_{j-i} x[n0+i],
#
# where p_k = (A^k)[0,0] is the w-impulse response. One m-sample chunk
# is therefore ONE (T, m) x (m, m) lower-triangular-Toeplitz product
# plus a (T, 2) x (2, m) state term -- all-parallel inside the chunk --
# and the sequential chain shrinks from S scan steps to S/m, at
# ~(m/2 + 2) MACs/sample vs the scan's ~6. The scan kernel measures
# ~9% of the measured VPU peak at 65536 tracks (issue-latency-bound on
# the 512-long dependency chain), which is the headroom this form
# trades FLOPs for. Same filter: tests pin bit-level-class agreement
# (<= 1e-5 abs) against the sequential f32 reference.
#
# Two implementations:
# * xla (iir_biquad_blockstate): lax.scan over chunk-major einsums --
#   measured SLOWER than the scan kernel at every size (the chunk-major
#   transposes add two full HBM passes; docs/BENCHMARKS.md A/B).
# * pallas (iir_biquad_blockstate_pallas): at m = 128 the chunk update
#   is a single full-shape (128, 128) @ (128, Tb) MXU matmul inside the
#   same one-read/one-write tile the scan kernel uses, so the sample
#   chain collapses from S dependent VPU steps to S/128 dependent MXU
#   dispatches with NO extra HBM traffic -- the FLOP trade the XLA
#   variant wanted, minus the layout passes it drowned in.


def blockstate_tables(coeffs, m: int):
    """Host-side f64-derived coefficient tables for the m-sample
    block-state form: (taps (m, m) lower-triangular Toeplitz of p_k,
    u (m, 2) rows of A^{j+1}[0, :]), float32.

    Tables depend only on (a1, a2, m): build once at setup from the
    concrete coefficients (the cuFFT-plan analog), never in-graph.
    """
    import numpy as np

    _, _, _, a1, a2 = (float(c) for c in coeffs)
    a = np.array([[-a1, -a2], [1.0, 0.0]], np.float64)
    powers = [np.eye(2)]
    for _ in range(m):
        powers.append(a @ powers[-1])
    p = np.array([powers[k][0, 0] for k in range(m)])
    taps = np.zeros((m, m))
    for j in range(m):
        taps[j, : j + 1] = p[j::-1]
    u = np.stack([powers[j + 1][0, :] for j in range(m)])
    return taps.astype(np.float32), u.astype(np.float32)


@functools.partial(jax.jit, static_argnames=())
def iir_biquad_blockstate(x: jax.Array, coeffs: jax.Array,
                          taps: jax.Array, u: jax.Array,
                          state: jax.Array):
    """Block-state biquad: x (tracks, S); coeffs (5,) = b0,b1,b2,a1,a2
    (only b* are read -- a* live in the tables); taps/u from
    blockstate_tables(m); state (tracks, 2) = (z1, z2).
    Returns (y, new_state). S must be a multiple of m.
    """
    b0, b1, b2 = coeffs[0], coeffs[1], coeffs[2]
    m = taps.shape[0]
    tracks, s = x.shape
    hi = jax.lax.Precision.HIGHEST
    xc = x.reshape(tracks, s // m, m).transpose(1, 0, 2)  # (chunks, T, m)

    def chunk(carry, xk):
        # carry: (T, 2) = s_prev = (w[-1], w[-2]) entering this chunk.
        w = (jnp.einsum("ti,ji->tj", xk, taps, precision=hi)
             + jnp.einsum("tc,jc->tj", carry, u, precision=hi))
        wm1 = jnp.concatenate([carry[:, :1], w[:, :-1]], axis=1)
        wm2 = jnp.concatenate([carry[:, 1:2], wm1[:, :-1]], axis=1)
        y = b0 * w + b1 * wm1 + b2 * wm2
        return w[:, -1:-3:-1], y  # new (z1, z2) = (w[m-1], w[m-2])

    z, yc = jax.lax.scan(chunk, state, xc)
    return yc.transpose(1, 0, 2).reshape(tracks, s), z


def _iir_blockstate_kernel(x_ref, t_ref, u_ref, c_ref, z_ref,
                           y_ref, zout_ref, *, m: int):
    """Block-state biquad kernel: x (S, Tb) sample-major, tracks on
    lanes, the m-sample chunk loop in-kernel.

    Per chunk: w = taps @ x_chunk on the MXU (full-shape at m = 128)
    plus the rank-2 entering-state term as two VPU outer products; y is
    the b-weighted combination of w with its 1- and 2-sample shifts
    (boundary rows come from the carried state); the new state is w's
    last two rows. One x read + one y write per tile -- identical HBM
    traffic to _iir_kernel, S/m sequential steps instead of S.

    t_ref: (m, m) Toeplitz taps; u_ref: (m, 2) state-response rows
    (both from blockstate_tables); c_ref: (1, 8) = b0,b1,b2,... row;
    z_ref/zout_ref: (2, Tb) state rows.
    """
    b0 = c_ref[0, 0]
    b1 = c_ref[0, 1]
    b2 = c_ref[0, 2]
    s = x_ref.shape[0]
    taps = t_ref[:]
    u0 = u_ref[:, 0:1]  # (m, 1): response of w[j] to entering z1
    u1 = u_ref[:, 1:2]

    def chunk(i, carry):
        z1, z2 = carry  # (1, Tb) rows
        xk = x_ref[pl.ds(i * m, m), :]
        w = jnp.dot(taps, xk, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        w = w + u0 * z1 + u1 * z2
        wm1 = jnp.concatenate([z1, w[:-1, :]], axis=0)
        wm2 = jnp.concatenate([z2, wm1[:-1, :]], axis=0)
        y_ref[pl.ds(i * m, m), :] = b0 * w + b1 * wm1 + b2 * wm2
        return (w[m - 1:m, :], w[m - 2:m - 1, :])

    z1, z2 = jax.lax.fori_loop(
        0, s // m, chunk, (z_ref[0:1, :], z_ref[1:2, :]))
    zout_ref[0:1, :] = z1
    zout_ref[1:2, :] = z2


def blockstate_effective_m(s: int, block_m: int) -> int:
    """Largest divisor of s in [2, block_m] (pow-2 S gives pow-2 m).

    Raises if no such divisor exists (prime S, or S whose factors all
    exceed block_m): both blockstate forms need m >= 2 -- the carried
    state is w's last TWO rows, so the m = 1 "chunk" degenerates.
    """
    m = min(block_m, s)
    while m > 1 and s % m != 0:
        m -= 1
    if m < 2:
        raise ValueError(
            f"blockstate needs a buffer-size divisor in "
            f"[2, {min(block_m, s)}]; buffer_size {s} has none -- "
            "use --iirForm scan")
    return m


@functools.partial(jax.jit, static_argnames=("track_block",))
def iir_biquad_blockstate_pallas(
    x: jax.Array, coeffs: jax.Array, taps: jax.Array, u: jax.Array,
    state: jax.Array, track_block: int = 512,
):
    """Pallas block-state path. Same signature/tables as the XLA form;
    m is taps.shape[0] (128 saturates the MXU; see BENCHMARKS.md A/B).
    S must be a multiple of m (the model sizes m via blockstate_effective_m).
    """
    tracks, s = x.shape
    m = taps.shape[0]
    if s % m != 0:
        raise ValueError(f"blockstate pallas: m ({m}) must divide S ({s})")
    tb = min(track_block, tracks)
    if tracks % tb != 0:
        pad = (-tracks) % tb
        xp = jnp.pad(x, ((0, pad), (0, 0)))
        sp = jnp.pad(state, ((0, pad), (0, 0)))
        y, z = iir_biquad_blockstate_pallas(
            xp, coeffs, taps, u, sp, track_block=tb)
        return y[:tracks], z[:tracks]

    xt = x.T  # (S, T)
    zt = state.T  # (2, T)
    c = jnp.pad(coeffs, (0, 3)).reshape(1, 8)

    kernel = functools.partial(_iir_blockstate_kernel, m=m)
    grid = (tracks // tb,)
    y, zout = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((s, tb), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, m), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, tb), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((s, tb), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, tb), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((s, tracks), x.dtype),
            jax.ShapeDtypeStruct((2, tracks), x.dtype),
        ],
    )(xt, taps, u, c, zt)
    return y.T, zout.T
