"""Digital waveguide strings: coupled forward/backward delay-line rails.

TPU-native equivalent of DWG1DNaiveKernel / DWG1DAccelKernel
(cuda/bench_dwg.cu:10-141). Per waveguide g and sample n (writePos = 0):

  cur = n % len_g ; bwd_pos = (cur + len_g/2) % len_g
  f = fwd[g, cur]     * damping_g
  b = bwd[g, bwd_pos] * damping_g
  if cur == input_tap_g:  f += in[n]*gain_g ; b += in[n]*gain_g
  fwd[g, cur]     = b * reflection_g
  bwd[g, bwd_pos] = f * reflection_g
  if cur == output_tap_g: out[n] += (f + b) * 0.5   (WAVEGUIDE_MIX_FACTOR)

The thread-per-waveguide loop becomes a lax.scan over samples with all
waveguides updated as vectors; the cross-thread atomicAdd into the mono
output becomes a masked sum over the waveguide axis (deterministic, no
race class). The "accel" variant's tricks (shared-memory input staging,
power-of-2 bit masking, bench_dwg.cu:61-141) are dispatch-level
optimizations that XLA already performs (the input block lives in
VMEM/registers; modulo strength reduction is the compiler's); the accel
registry entry maps to the same fused program with power-of-2-rounded
delay lengths, mirroring DWG1DAccelBenchmark.swift:15-86's aligned
length distribution.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def dwg_block(
    x: jax.Array,  # (S,) mono input block
    fwd: jax.Array,  # (G, Lmax) forward rail
    bwd: jax.Array,  # (G, Lmax) backward rail
    lengths: jax.Array,  # (G,) int32
    input_taps: jax.Array,  # (G,) int32
    output_taps: jax.Array,  # (G,) int32
    gains: jax.Array,  # (G,) float32
    reflections: jax.Array,  # (G,) float32
    dampings: jax.Array,  # (G,) float32
):
    """Returns (out (S,), fwd', bwd')."""
    g = fwd.shape[0]
    rows = jnp.arange(g)
    half = lengths // 2

    def step(carry, inputs):
        fwd_c, bwd_c = carry
        n, xn = inputs
        cur = jnp.mod(n, lengths)
        bpos = jnp.mod(cur + half, lengths)

        f = fwd_c[rows, cur] * dampings
        b = bwd_c[rows, bpos] * dampings

        inj = jnp.where(cur == input_taps, xn * gains, 0.0)
        f = f + inj
        b = b + inj

        fwd_c = fwd_c.at[rows, cur].set(b * reflections)
        bwd_c = bwd_c.at[rows, bpos].set(f * reflections)

        out_n = jnp.sum(jnp.where(cur == output_taps, (f + b) * 0.5, 0.0))
        return (fwd_c, bwd_c), out_n

    s = x.shape[0]
    ns = jnp.arange(s, dtype=jnp.int32)
    (fwd_f, bwd_f), out = jax.lax.scan(step, (fwd, bwd), (ns, x))
    return out, fwd_f, bwd_f
