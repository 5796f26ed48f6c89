"""Pallas TPU kernel for the digital-waveguide strings (one-hot form).

SUPERSEDED for production by ops/dwg_arc.py (round 2): the arc-window /
aligned-stream redesign is ~60x faster at 1024 voices. Retained as an
independent third implementation (scan != one-hot != arc) -- the tests
cross-validate all three against each other and the NumPy golden, which
is how the arc kernel's correctness was established.

The XLA path (ops/dwg.py) carries the rails through a lax.scan with
per-row gathers/scatters at the circular positions -- XLA lowers those
to serialized scatter ops (~10 ms/block measured). This kernel keeps a
group of waveguides' rails VMEM-resident for the whole block and
replaces the per-waveguide dynamic indexing with one-hot lane masks:
waveguides on the 128 sublanes, delay positions on the lanes, so "read
rail at position cur_g" is a compare + masked lane-reduce and "write
back" is a masked select -- all full-width VPU passes, no scatter.

The grid iterates over groups of 128 waveguides (a full (128, Lpad)
rail pair is ~2 MB of VMEM; 1024+ voices would blow the 16 MB budget in
one block), accumulating each group's contribution into the shared mono
output -- race-free because Pallas TPU runs grid steps sequentially.

Layout: rails (G, Lpad) with Lpad = delay capacity rounded to 128
lanes; per-waveguide parameters as (G, 1) columns broadcasting along
lanes. Mono input/output live in SMEM as per-sample scalars.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WG_GROUP = 128  # waveguides per grid step


def _dwg_kernel(x_ref, fwd_in, bwd_in, lengths_ref, itap_ref, otap_ref,
                gain_ref, refl_ref, damp_ref,
                out_ref, fwd_out, bwd_out,
                *, buffer_size: int, mix: float):
    step = pl.program_id(0)
    g, lpad = fwd_in.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (g, lpad), 1)
    lengths = lengths_ref[...]  # (G, 1) int32
    half = lengths // 2
    itap = itap_ref[...]
    otap = otap_ref[...]
    gain = gain_ref[...]
    refl = refl_ref[...]
    damp = damp_ref[...]

    def body(n, carry):
        fwd, bwd = carry
        cur = n - (n // lengths) * lengths  # (G,1): n % length
        bpos = cur + half
        bpos = bpos - (bpos // lengths) * lengths

        is_cur = lane == cur  # (G, Lpad) one-hot per row
        is_bpos = lane == bpos

        f = jnp.sum(jnp.where(is_cur, fwd, 0.0), axis=1, keepdims=True) * damp
        b = jnp.sum(jnp.where(is_bpos, bwd, 0.0), axis=1, keepdims=True) * damp

        inj = jnp.where(cur == itap, x_ref[0, n] * gain, 0.0)
        f = f + inj
        b = b + inj

        fwd = jnp.where(is_cur, b * refl, fwd)
        bwd = jnp.where(is_bpos, f * refl, bwd)

        contrib = jnp.where(cur == otap, (f + b) * jnp.float32(mix), 0.0)
        # SMEM allows scalar accesses only: first group seeds the output
        # cell, later groups accumulate (grid steps run sequentially).
        prev = jnp.where(step == 0, jnp.float32(0.0), out_ref[0, n])
        out_ref[0, n] = prev + jnp.sum(contrib)
        return (fwd, bwd)

    fwd, bwd = jax.lax.fori_loop(
        0, buffer_size, body, (fwd_in[...], bwd_in[...])
    )
    fwd_out[...] = fwd
    bwd_out[...] = bwd


@functools.partial(jax.jit, static_argnames=())
def dwg_block_pallas(
    x: jax.Array,  # (S,)
    fwd: jax.Array,  # (G, Lmax)
    bwd: jax.Array,
    lengths: jax.Array,  # (G,) int32
    input_taps: jax.Array,
    output_taps: jax.Array,
    gains: jax.Array,
    reflections: jax.Array,
    dampings: jax.Array,
):
    """Same contract as ops.dwg.dwg_block: (out (S,), fwd', bwd')."""
    g, lmax = fwd.shape
    s = x.shape[0]
    lpad = -(-lmax // 128) * 128
    gpad = -(-g // WG_GROUP) * WG_GROUP
    n_groups = gpad // WG_GROUP

    def pad2(a):
        return jnp.pad(a, ((0, gpad - g), (0, lpad - lmax)))

    def col_f(a):
        return jnp.pad(a.astype(jnp.float32), (0, gpad - g)).reshape(gpad, 1)

    def col_i(a, fill):
        # padded rows get length 1 so modulo stays defined; taps -1 so
        # they never fire
        padded = jnp.pad(a.astype(jnp.int32), (0, gpad - g),
                         constant_values=fill)
        return padded.reshape(gpad, 1)

    mix = 0.5  # WAVEGUIDE_MIX_FACTOR (benchmark_constants.cuh)
    kernel = functools.partial(_dwg_kernel, buffer_size=s, mix=mix)

    def rail_spec():
        return pl.BlockSpec((WG_GROUP, lpad), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def col_spec():
        return pl.BlockSpec((WG_GROUP, 1), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    out, fwd_o, bwd_o = pl.pallas_call(
        kernel,
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec((1, s), lambda i: (0, 0), memory_space=pltpu.SMEM),
            rail_spec(), rail_spec(),
            col_spec(), col_spec(), col_spec(),
            col_spec(), col_spec(), col_spec(),
        ],
        out_specs=[
            pl.BlockSpec((1, s), lambda i: (0, 0), memory_space=pltpu.SMEM),
            rail_spec(), rail_spec(),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, s), jnp.float32),
            jax.ShapeDtypeStruct((gpad, lpad), jnp.float32),
            jax.ShapeDtypeStruct((gpad, lpad), jnp.float32),
        ],
    )(
        x.reshape(1, s), pad2(fwd), pad2(bwd),
        col_i(lengths, 1), col_i(input_taps, -1), col_i(output_taps, -1),
        col_f(gains), col_f(reflections), col_f(dampings),
    )
    return out[0], fwd_o[:g, :lmax], bwd_o[:g, :lmax]
