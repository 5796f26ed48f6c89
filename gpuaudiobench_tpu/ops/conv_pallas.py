"""Pallas TPU kernel for direct per-track FIR convolution
(Conv1DTextureMemoryImplKernel, cuda/bench_conv1d.cu:7-27: one thread
per track looping samples x taps; here one lane per track with taps on
sublane offsets).

The XLA path lowers the per-track FIR as a grouped (depthwise)
convolution, which has no matmul structure: measured 0.617 ms/block at
the CUDA defaults (128 tracks, IR 1024) = 0.4% of MXU f32 peak
(docs/RESULTS_r2.md roofline). This kernel instead runs the FIR as a
sample-major roll-MAC on the VPU:

* layout (samples, tracks): tracks on the 128 LANES, samples on
  sublanes, so each tap's shifted window read is a sublane-offset VMEM
  load (cheap) instead of a lane rotate (expensive);
* the (S, 128) accumulator stays VMEM/register-resident across all L
  taps: per tap, one broadcast-row fused multiply-add
  ``acc += ir[l, :] * x_pad[L-1-l : L-1-l+S, :]``;
* taps unrolled 8x per loop step to amortize loop overhead.

The caller supplies the already edge-padded input (clamp or bleed --
the same (T, S+L-1) buffer ops/conv.py builds), transposed; per-track
IRs arrive (L, T). Tracks tile the lane axis in groups of 128 via the
grid. Falls back to the XLA depthwise path off-TPU or for unaligned
shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
UNROLL = 8


def _conv_kernel(x_ref, ir_ref, out_ref, *, length: int, samples: int):
    """x_ref: (L-1+S, 128) padded sample-major; ir_ref: (L, 128);
    out_ref: (S, 128). out[s, t] = sum_l ir[l, t] * x[s - l + L-1, t]."""
    acc = jnp.zeros((samples, LANES), jnp.float32)

    def body(k, acc):
        for u in range(UNROLL):
            l = k * UNROLL + u
            w = x_ref[pl.ds(length - 1 - l, samples), :]
            acc = acc + ir_ref[l, :][None, :] * w
        return acc

    acc = jax.lax.fori_loop(0, length // UNROLL, body, acc)
    for l in range((length // UNROLL) * UNROLL, length):
        w = x_ref[pl.ds(length - 1 - l, samples), :]
        acc = acc + ir_ref[l, :][None, :] * w
    out_ref[:, :] = acc


@functools.partial(jax.jit, static_argnames=())
def conv1d_direct_pallas(x_padded: jax.Array, ir: jax.Array) -> jax.Array:
    """Direct FIR on the edge-padded input.

    x_padded: (T, S + L - 1) (the buffer conv1d_direct builds);
    ir: (T, L). Returns (T, S) float32.
    """
    t, padded = x_padded.shape
    l = ir.shape[1]
    s = padded - (l - 1)
    tpad = -(-t // LANES) * LANES

    xt = jnp.pad(x_padded, ((0, tpad - t), (0, 0))).T  # (L-1+S, Tpad)
    irt = jnp.pad(ir, ((0, tpad - t), (0, 0))).T       # (L, Tpad)

    kernel = functools.partial(_conv_kernel, length=l, samples=s)
    out = pl.pallas_call(
        kernel,
        grid=(tpad // LANES,),
        in_specs=[
            pl.BlockSpec((padded, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((l, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((s, LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s, tpad), jnp.float32),
    )(xt, irt)
    return out.T[:t]
