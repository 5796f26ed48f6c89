"""Uniformly-partitioned overlap-save (UPOLS) streaming convolution:
the real-time convolution-reverb engine, as a TPU-native block program.

Extension beyond the reference's registered set: Conv1D_accel
(cuda/bench_conv1d_accel.cu) fast-convolves one buffer with an IR short
enough for a single FFT segment (fftSize = nextPow2(irLen + bufSize -
1), bench_conv1d_accel.cu:52), which stops being viable once the IR is
tens of thousands of taps. Production convolution reverbs instead split
the IR into bufferSize partitions, keep a frequency-domain delay line
(FDL) of past input spectra, and per block pay one forward FFT, one
multiply-accumulate across partitions, and one inverse FFT.

TPU-first design:
* One FFT size everywhere: N = 2*B (50% overlap-save), so the hot loop
  is two batched rffts of static shape plus an elementwise complex MAC
  reduced over the partition axis -- XLA fuses the MAC with the
  surrounding FFT gathers, and there is no data-dependent shape
  anywhere.
* The FDL lives in HBM as two float32 (T, P, bins) planes (explicit
  re/im: complex64 never crosses host<->device on some PJRT runtimes --
  the ops/conv.py precompute_ir_spectra workaround -- and the VPU does
  the 4-mul complex product on real lanes anyway).
* The per-block "shift" of the delay line is a concat that drops the
  oldest spectrum; under jit the copy is one HBM-bandwidth pass over
  the FDL, which the cost model charges.

The partition spectra are computed once at setup on the device (the
cuFFT-plan + precomputeImpulseResponseFFTs analog,
bench_conv1d_accel.cu:254-304).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def num_partitions(ir_length: int, block_size: int) -> int:
    return max(1, -(-ir_length // block_size))


@functools.partial(jax.jit, static_argnames=("block_size",))
def partition_spectra(ir: jax.Array, block_size: int):
    """(T, L) IRs -> float32 re/im spectra of shape (T, P, B+1).

    Partition p holds rfft([ir[pB:(p+1)B], zeros(B)]): the first half
    carries the taps, the second half is the overlap-save guard.
    """
    t, l = ir.shape
    b = block_size
    p = num_partitions(l, b)
    padded = jnp.zeros((t, p * b), jnp.float32).at[:, :l].set(ir)
    parts = padded.reshape(t, p, b)
    seg = jnp.concatenate([parts, jnp.zeros_like(parts)], axis=-1)
    spec = jnp.fft.rfft(seg, axis=-1)
    return (spec.real.astype(jnp.float32), spec.imag.astype(jnp.float32))


@jax.jit
def partconv_block(x, prev, fdl_re, fdl_im, h_re, h_im):
    """One streamed block of uniformly-partitioned overlap-save conv.

    x, prev:        (T, B) current and previous input blocks
    fdl_re/fdl_im:  (T, P, B+1) delay line of past input spectra,
                    newest first
    h_re/h_im:      (T, P, B+1) partition spectra from partition_spectra

    Returns (y, fdl_re', fdl_im'): y is the (T, B) output block; the
    caller carries (x, fdl') as the next block's (prev, fdl).
    """
    b = x.shape[1]
    seg = jnp.concatenate([prev, x], axis=1)  # (T, 2B) overlap-save
    spec = jnp.fft.rfft(seg, axis=1)  # (T, B+1)
    fdl_re = jnp.concatenate(
        [spec.real.astype(jnp.float32)[:, None], fdl_re[:, :-1]], axis=1)
    fdl_im = jnp.concatenate(
        [spec.imag.astype(jnp.float32)[:, None], fdl_im[:, :-1]], axis=1)
    # Complex MAC over partitions: Y = sum_p FDL[p] * H[p].
    y_re = jnp.sum(fdl_re * h_re - fdl_im * h_im, axis=1)
    y_im = jnp.sum(fdl_re * h_im + fdl_im * h_re, axis=1)
    y_full = jnp.fft.irfft(jax.lax.complex(y_re, y_im), 2 * b, axis=1)
    return y_full[:, b:].astype(jnp.float32), fdl_re, fdl_im
