"""Pallas TPU kernel for the modal phasor bank.

The XLA scan version (ops/modal.py) issues one fused loop step per
sample with the whole (M,) mode state streamed between loop iterations.
This kernel tiles the mode axis across the grid, holds each tile's
phasor state in VMEM/registers for the entire buffer loop, and reduces
each sample's (tile -> 32 tracks) contribution in-register -- one
kernel launch, state never round-trips to HBM between samples.

Layout: a tile of 32768 consecutive modes is shaped (256, 128)
(sublane x lane) so the rotation is a full-width VPU op. The
mode -> track fold (mode % 32, the Metal kernel's round-robin atomic
accumulation, kernels_benchmark_staging.metal:140-160) becomes a
sublane reduce plus lane-aligned slice adds -- no atomics, and because
Pallas TPU executes grid steps sequentially on a core, the shared
output block accumulates race-free.

The accumulator block is (S, 32) sample-major so each sample's update
writes one contiguous 32-lane row instead of a strided column; the
caller transposes once at the end.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MODE_TILE = 65536  # modes per grid step: (512 sublanes, 128 lanes).
# Swept on v5e (1M modes x 512 samples): 16384 -> 1.88 ms, 32768 ->
# 2.10 ms, 65536 -> 1.66 ms (8x unroll) -> 1.49 ms (16x unroll);
# 131072 exceeds the 16 MB scoped-VMEM budget.


def _sample_unroll(buffer_size: int) -> int:
    """Largest sample-loop unroll <= min(128, S/2) dividing the
    buffer. Swept on v5e (1M modes, chained-scan ms/block): at S=512,
    16 -> 1.325, 32 -> 1.332, 64 -> 1.282, 128 -> 1.252, 256 -> 1.255,
    512 (full) -> 2.208; the full-buffer collapse reproduces at every
    size (S=64: u64 0.392 vs u32 0.308; S=128: u128 0.617 vs u64
    0.423) -- the whole-buffer contrib concat thrashes -- hence the
    S/2 cap. All unrolls are bit-exact vs each other (the rotation
    chain is the same op order per mode)."""
    cap = min(128, max(1, buffer_size // 2))
    for u in (128, 64, 32, 16, 8, 4, 2):
        if u <= cap and buffer_size % u == 0:
            return u
    return 1


def _modal_kernel(cos_ref, sin_ref, re_ref, im_ref,
                  out_ref, re_out_ref, im_out_ref,
                  *, buffer_size: int, output_tracks: int):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    cos_w = cos_ref[:, :]
    sin_w = sin_ref[:, :]
    folds = 128 // output_tracks  # 128 % output_tracks == 0 (caller checks)
    unroll = _sample_unroll(buffer_size)

    def fold(new_re):
        # mode -> track fold: flat index f = r*128 + lane, and since
        # 128 % T_out == 0, f % T_out == lane % T_out -- so summing
        # lane-aligned slices implements the % T_out round-robin without
        # a lane-width reshape (unsupported shape cast in Mosaic).
        # Sublane-reduce FIRST at full 128-lane width, then fold lanes:
        # partial-width (rows, T_out) ops would burn whole vregs at
        # T_out/128 lane utilization.
        row = new_re.sum(axis=0, keepdims=True)  # (1, 128), full width
        acc = row[:, 0:output_tracks]
        for k in range(1, folds):
            acc = acc + row[:, k * output_tracks:(k + 1) * output_tracks]
        return acc  # (1, T_out)

    def body(ng, carry):
        # amp is pre-folded into the state (rotation is linear), so the
        # per-sample contribution is just Re(state). Unrolling chains
        # `unroll` rotations through registers per VMEM state round
        # trip -- the kernel is VMEM-traffic-bound, not flop-bound.
        re, im = carry
        contribs = []
        for _ in range(unroll):
            re, im = re * cos_w - im * sin_w, re * sin_w + im * cos_w
            contribs.append(fold(re))
        block = contribs[0] if unroll == 1 else jnp.concatenate(contribs, axis=0)
        out_ref[pl.ds(ng * unroll, unroll), :] += block
        return (re, im)

    re_f, im_f = jax.lax.fori_loop(
        0, buffer_size // unroll, body, (re_ref[:, :], im_ref[:, :])
    )
    re_out_ref[:, :] = re_f
    im_out_ref[:, :] = im_f


def _modal_kernel_res(eps_ref, y_ref, q_ref,
                      out_ref, y_out_ref, q_out_ref,
                      *, buffer_size: int, output_tracks: int):
    """Gordon-Smith coupled resonator form of the bank.

    Each mode advances by two dependent shears
        q[n] = q[n-1] - eps * y[n-1]
        y[n] = y[n-1] + eps * q[n]      (eps = 2 sin(w/2))
    which compose to an exact rotation by w -- two FMAs per mode-sample
    instead of the phasor rotation's four multiplies, with the sin/cos
    tiles replaced by one eps tile. Unlike the one-FMA Chebyshev
    two-term recurrence (tried first: its rounding error summed over
    1M modes landed right AT the 1e-4 validation tolerance), the shear
    pair is area-preserving, so errors stay rotation-grade (~1e-6 at
    1M modes). amp stays pre-folded (linear).

    State is (y, q); ``res_init`` maps phasor (re, im) states onto it,
    and streaming carries it natively across blocks.
    """
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    eps = eps_ref[:, :]
    folds = 128 // output_tracks
    unroll = _sample_unroll(buffer_size)

    def fold(s):
        row = s.sum(axis=0, keepdims=True)  # (1, 128), full width
        acc = row[:, 0:output_tracks]
        for k in range(1, folds):
            acc = acc + row[:, k * output_tracks:(k + 1) * output_tracks]
        return acc  # (1, T_out)

    def body(ng, carry):
        y, q = carry
        contribs = []
        for _ in range(unroll):
            q = q - eps * y
            y = y + eps * q
            contribs.append(fold(y))
        block = contribs[0] if unroll == 1 else jnp.concatenate(contribs, axis=0)
        out_ref[pl.ds(ng * unroll, unroll), :] += block
        return (y, q)

    y_f, q_f = jax.lax.fori_loop(
        0, buffer_size // unroll, body, (y_ref[:, :], q_ref[:, :])
    )
    y_out_ref[:, :] = y_f
    q_out_ref[:, :] = q_f


def res_init(cos_w, sin_w, re_f, im_f):
    """Phasor -> Gordon-Smith state for amp-prefolded (re, im).

    With h = w/2 (half-angle roots are safe: w in (0, pi)):
      y0 = re,  q0 = sin(h)*re - cos(h)*im
    so step 1 gives q1 = q0 - eps*y0 = -sin(h)*re - cos(h)*im and
    y1 = y0 + eps*q1 = re*(1 - 2sin^2 h) - im*2 sin h cos h
       = cos(w)*re - sin(w)*im -- exactly the rotation's first output.
    """
    # Half-angle via sin, not 1-cos: sqrt((1-c)/2) cancels
    # catastrophically for low-frequency modes (c ~ 1 in f32), skewing
    # their resonator frequency by up to ~1e-2 relative; sin(w/2) =
    # sin(w) / (2 cos(w/2)) is exact to f32 for w in (-pi/2 .. beyond),
    # and cos(w/2) = sqrt((1+c)/2) has no cancellation there.
    ch = jnp.sqrt((1.0 + cos_w) * 0.5)
    sh = sin_w / (2.0 * ch)
    eps = 2.0 * sh
    return eps, re_f, sh * re_f - ch * im_f


@functools.partial(
    jax.jit, static_argnames=("buffer_size", "output_tracks", "tile")
)
def modal_res_step(eps, y0, q0, buffer_size, output_tracks,
                   tile):
    """One streaming block in resonator form: returns
    (out (S, T_out) sample-major, y', q'); chain blocks by feeding the
    states straight back."""
    m = eps.shape[0]
    rows = tile // 128
    grid = (m // tile,)

    def tile_spec():
        return pl.BlockSpec((rows, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def reshape2d(a):
        return a.reshape(m // 128, 128)

    kernel = functools.partial(
        _modal_kernel_res, buffer_size=buffer_size,
        output_tracks=output_tracks,
    )
    out_sn, y_o, q_o = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[tile_spec() for _ in range(3)],
        out_specs=[
            pl.BlockSpec(
                (buffer_size, output_tracks), lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            tile_spec(),
            tile_spec(),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((buffer_size, output_tracks), eps.dtype),
            jax.ShapeDtypeStruct((m // 128, 128), eps.dtype),
            jax.ShapeDtypeStruct((m // 128, 128), eps.dtype),
        ],
    )(reshape2d(eps), reshape2d(y0), reshape2d(q0))
    return out_sn, y_o.reshape(m), q_o.reshape(m)


@functools.partial(
    jax.jit,
    static_argnames=("buffer_size", "output_tracks", "mode_tile",
                     "algorithm"),
)
def modal_bank_pallas(
    amp: jax.Array,
    cos_w: jax.Array,
    sin_w: jax.Array,
    state_re: jax.Array,
    state_im: jax.Array,
    buffer_size: int,
    output_tracks: int,
    mode_tile: int = MODE_TILE,
    algorithm: str = "rotation",
):
    """Same contract as modal_bank_xla: (out (T_out, S), re', im').

    The benchmark's iteration semantics never persist phasor state
    (Metal parity: the kernel reads but does not write the state
    buffer), so the returned states are the unchanged inputs.

    ``algorithm``: "rotation" (default -- the 4-multiply phasor form
    whose f32 sequence bit-matches the Metal-style golden and sits
    ~1e-6 from the exact sinusoid of the stored coefficients) or "res"
    (Gordon-Smith resonator, 2 FMAs/mode-sample -- measured only ~14%
    faster at 1M modes because the kernel is fold/VMEM-bound, while its
    eps quantization drifts ~3e-4 relative from the exact sinusoid by
    sample 512; kept as a documented opt-in, not the validated path).
    """
    if 128 % output_tracks != 0:
        # Lane fold requires output_tracks to divide the 128-lane width;
        # other counts use the XLA scan path.
        from gpuaudiobench_tpu.ops.modal import modal_bank_xla

        return modal_bank_xla(
            amp, cos_w, sin_w, state_re, state_im, buffer_size, output_tracks
        )
    m = amp.shape[0]
    tile = min(mode_tile, m)
    # Tile must flatten row-major onto consecutive modes and fold evenly
    # onto output tracks: keep it a multiple of lcm(128, output_tracks).
    align = math.lcm(128, output_tracks)
    if tile % align != 0:
        tile = align * max(1, tile // align)
    if m % tile != 0:
        pad = (-m) % tile
        z = jnp.zeros(pad, amp.dtype)
        out, _, _ = modal_bank_pallas(
            jnp.concatenate([amp, z]),
            jnp.concatenate([cos_w, jnp.ones(pad, cos_w.dtype)]),
            jnp.concatenate([sin_w, z]),
            jnp.concatenate([state_re, z]),
            jnp.concatenate([state_im, z]),
            buffer_size,
            output_tracks,
            mode_tile=tile,
            algorithm=algorithm,
        )
        return out, state_re, state_im

    if algorithm == "rotation":
        out_sn, _, _ = _modal_folded(
            cos_w, sin_w, amp * state_re, amp * state_im,
            buffer_size, output_tracks, tile,
        )
    else:
        eps, y0, q0 = res_init(cos_w, sin_w, amp * state_re,
                               amp * state_im)
        out_sn, _, _ = modal_res_step(
            eps, y0, q0, buffer_size, output_tracks, tile
        )
    return out_sn.T, state_re, state_im


@functools.partial(
    jax.jit, static_argnames=("buffer_size", "output_tracks", "tile")
)
def _modal_folded(cos_w, sin_w, re_f, im_f, buffer_size, output_tracks, tile):
    """Core pallas call on amp-prefolded states. Returns
    (out (S, T_out) sample-major, re', im') with the TRUE rotated
    (still amp-scaled) final states, enabling block chaining."""
    m = cos_w.shape[0]
    rows = tile // 128
    grid = (m // tile,)

    def tile_spec():
        return pl.BlockSpec((rows, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def reshape2d(a):
        return a.reshape(m // 128, 128)

    kernel = functools.partial(
        _modal_kernel, buffer_size=buffer_size, output_tracks=output_tracks
    )
    out_sn, re_o, im_o = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[tile_spec() for _ in range(4)],
        out_specs=[
            pl.BlockSpec(
                (buffer_size, output_tracks), lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            tile_spec(),
            tile_spec(),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((buffer_size, output_tracks), cos_w.dtype),
            jax.ShapeDtypeStruct((m // 128, 128), cos_w.dtype),
            jax.ShapeDtypeStruct((m // 128, 128), cos_w.dtype),
        ],
    )(
        reshape2d(cos_w), reshape2d(sin_w), reshape2d(re_f), reshape2d(im_f)
    )
    return out_sn, re_o.reshape(m), im_o.reshape(m)


def stream_tile(m: int, output_tracks: int, mode_tile: int = MODE_TILE):
    """Mode-tile size for block-chained streaming: the largest aligned
    tile <= mode_tile that divides m exactly (None when output_tracks
    cannot lane-fold or m is misaligned -- callers pad m or fall back to
    the XLA scan)."""
    if 128 % output_tracks != 0:
        return None
    align = math.lcm(128, output_tracks)
    if m % align != 0:
        return None
    top = min(mode_tile, m)
    top -= top % align
    for cand in range(top, 0, -align):
        if m % cand == 0:
            return cand
    return None


def modal_folded_step(cos_w, sin_w, re_f, im_f, buffer_size, output_tracks,
                      tile):
    """One streaming block on amp-prefolded phasor states: returns
    (out (S, T_out), re', im') with the TRUE rotated states, enabling
    block chaining (unlike modal_bank_pallas, whose contract returns
    the unchanged inputs for Metal parity)."""
    return _modal_folded(
        cos_w, sin_w, re_f, im_f, buffer_size, output_tracks, tile
    )


@functools.partial(
    jax.jit,
    static_argnames=("buffer_size", "output_tracks", "n_blocks", "mode_tile"),
)
def modal_bank_stream(
    amp: jax.Array,
    cos_w: jax.Array,
    sin_w: jax.Array,
    state_re: jax.Array,
    state_im: jax.Array,
    buffer_size: int,
    output_tracks: int,
    n_blocks: int,
    mode_tile: int = MODE_TILE,
):
    """Streaming synthesis: n_blocks consecutive buffers in ONE
    executable, phasor state carried across blocks (the continuous
    real-time-audio workload the per-block benchmark approximates).
    Returns (outs (n_blocks, T_out, S), re', im') with amp-folded final
    states."""
    if 128 % output_tracks != 0:
        raise ValueError("output_tracks must divide 128 for the pallas path")
    m = amp.shape[0]
    tile = stream_tile(m, output_tracks, mode_tile)
    if tile is None:
        raise ValueError("mode count must be a multiple of the tile size")

    def body(carry, _):
        re, im = carry
        out_sn, re2, im2 = _modal_folded(
            cos_w, sin_w, re, im, buffer_size, output_tracks, tile
        )
        return (re2, im2), out_sn.T

    (re_f, im_f), outs = jax.lax.scan(
        body, (amp * state_re, amp * state_im), None, length=n_blocks
    )
    return outs, re_f, im_f
