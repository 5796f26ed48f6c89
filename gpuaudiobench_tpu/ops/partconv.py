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
* The delay line DEFAULT is the textbook SHIFT form (partconv_block):
  a full sequential FDL rewrite every block. That sounds like the
  wasteful choice -- it is an extra read+write pass over the FDL --
  but on TPU sequential streams win: measured saturated tier on v5e,
  shift = 0.174 ms at 128 tracks / 6.73 ms at 2048, vs the two ring
  forms below. `--partconvForm ring` keeps the ring.
* Ring form history (both measured, docs/BENCHMARKS.md): aligning H
  to a never-moving FDL needs a rotation by the traced head. (a) A
  rotated partition GATHER (jnp.take with a traced index vector)
  measured 62 GB/s at 2048 tracks -- 9% of the stream peak, an 8.5x
  cliff over shift -- XLA lowers the dynamic gather row-by-row.
  (b) The shipped ring instead stores the spectra DOUBLED and
  index-negated along the partition axis (ring_aligned_spectra:
  H2[j] = H[(-j) mod P], shape (T, 2P, bins)), so the alignment
  H[(head - s) mod P], s = 0..P-1 is the CONTIGUOUS window
  H2[P-head : 2P-head] -- one dynamic_slice (2x H storage, no FDL
  rewrite). That wins the single-block device tier at scale (4.90 ms
  vs shift's 6.28 at 2048 tracks) but in the chained streaming scan
  the window read stops fusing and costs a materialized copy
  (saturated 8.70 ms vs shift's 6.73) -- hence shift as default.

The partition spectra are computed once at setup on the device (the
cuFFT-plan + precomputeImpulseResponseFFTs analog,
bench_conv1d_accel.cu:254-304).

NON-UNIFORM form (--partconvForm nupols): the Gardner (1995)
production-reverb scheme, two levels. Uniform partitioning reads the
ENTIRE FDL and H every block -- O(irLength) HBM traffic per block --
although the old spectra change only one slot per block. The nupols
form keeps the first K*B taps in a K-slot uniform head (exactly the
shift form above) and splits the tail into partitions of K*B taps
processed at chunk granularity: one rfft(2KB) per K blocks, the tail
MAC SPREAD across the K blocks of each window (a carried
partial-spectrum accumulator; slots are statically group-assigned to
block phases via lax.switch, so every read is a static slice), and
one irfft(2KB) per window whose KB-sample result is served B at a
time. Amortized tail traffic: each tail slot is read once per K
blocks instead of every block -- a ~K-fold cut on the tail, which
dominates for long IRs. Per-block cost stays near-uniform by
construction (the MAC is spread); the window-boundary block adds the
two 2KB FFTs and the newest slot's MAC term. Head size K*B is exactly
the causality bound: the tail's first partition sits at tap offset
K*B, so the chunk completing at block wK-1 is first needed for output
block wK -- its spectrum (the m=0 term) is computed AT the boundary
block, while every older slot (m >= 1) has a full window and is
spread. The scheme is the SAME linear filter -- the fold-algebra
golden and the shift-form oracle validate it unchanged.
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


def _forward_spectrum(x, prev):
    b = x.shape[1]
    seg = jnp.concatenate([prev, x], axis=1)  # (T, 2B) overlap-save
    spec = jnp.fft.rfft(seg, axis=1)  # (T, B+1)
    return spec.real.astype(jnp.float32), spec.imag.astype(jnp.float32)


def _inverse_block(y_re, y_im, b):
    y_full = jnp.fft.irfft(jax.lax.complex(y_re, y_im), 2 * b, axis=1)
    return y_full[:, b:].astype(jnp.float32)


@jax.jit
def partconv_block(x, prev, fdl_re, fdl_im, h_re, h_im):
    """One streamed block of uniformly-partitioned overlap-save conv,
    SHIFT form: the delay line physically moves one slot per block.

    x, prev:        (T, B) current and previous input blocks
    fdl_re/fdl_im:  (T, P, B+1) delay line of past input spectra,
                    newest first
    h_re/h_im:      (T, P, B+1) partition spectra from partition_spectra

    Returns (y, fdl_re', fdl_im'): y is the (T, B) output block; the
    caller carries (x, fdl') as the next block's (prev, fdl).

    This is the DEFAULT form: the shift is two full sequential HBM
    passes over the FDL (read + write) that the ring form does not
    pay, and on TPU that sequential traffic still beats every measured
    rotated-read alternative in the chained streaming tier (module
    docstring; 2x2 A/B in docs/BENCHMARKS.md).
    """
    b = x.shape[1]
    sre, sim = _forward_spectrum(x, prev)
    fdl_re = jnp.concatenate([sre[:, None], fdl_re[:, :-1]], axis=1)
    fdl_im = jnp.concatenate([sim[:, None], fdl_im[:, :-1]], axis=1)
    # Complex MAC over partitions: Y = sum_p FDL[p] * H[p]. H may be
    # stored narrower (f16, --partconvHDtype); compute is f32 — the
    # convert fuses into the (traffic-bound) read.
    hr = h_re.astype(jnp.float32)
    hi = h_im.astype(jnp.float32)
    y_re = jnp.sum(fdl_re * hr - fdl_im * hi, axis=1)
    y_im = jnp.sum(fdl_re * hi + fdl_im * hr, axis=1)
    return _inverse_block(y_re, y_im, b), fdl_re, fdl_im


def ring_aligned_spectra(h_re, h_im):
    """(T, P, bins) partition spectra -> (T, 2P, bins) doubled,
    index-negated planes for partconv_block_ring: H2[j] = H[(-j) mod P]
    for j = 0..2P-1, so the ring alignment H[(head - s) mod P],
    s = 0..P-1 is the contiguous window H2[P-head : 2P-head] (one
    dynamic_slice per block instead of a partition gather). Computed
    once at setup (the static gather here is free); 2x H storage.
    """
    p = h_re.shape[1]
    idx = (-jnp.arange(2 * p)) % p
    return jnp.take(h_re, idx, axis=1), jnp.take(h_im, idx, axis=1)


@jax.jit
def partconv_block_ring(x, prev, head, fdl_re, fdl_im, h2_re, h2_im):
    """Ring-buffer form (--partconvForm ring): the FDL never moves.

    The new spectrum overwrites ONE slot (head); slot s then holds the
    spectrum of the block (head - s) mod P blocks ago, so
    Y = sum_s FDL[s] * H[(head - s) mod P]. h2_re/h2_im are the
    DOUBLED index-negated spectra from ring_aligned_spectra
    ((T, 2P, bins)): the alignment is the contiguous window
    H2[P-head : 2P-head], one dynamic_slice fused into the MAC's read
    -- sequential HBM traffic, where a jnp.take partition gather
    measured 9% of stream rate at 2048 tracks (module docstring).
    Traffic per block is one read of FDL + one window read of H2; the
    shift form additionally rewrites the whole FDL every block.

    head is an int32 scalar carried by the caller, incremented mod P
    here. Returns (y, head', fdl_re', fdl_im').
    """
    b = x.shape[1]
    p = fdl_re.shape[1]
    sre, sim = _forward_spectrum(x, prev)
    head = (head + 1) % p
    fdl_re = jax.lax.dynamic_update_slice_in_dim(
        fdl_re, sre[:, None], head, axis=1)
    fdl_im = jax.lax.dynamic_update_slice_in_dim(
        fdl_im, sim[:, None], head, axis=1)
    hr = jax.lax.dynamic_slice_in_dim(
        h2_re, p - head, p, axis=1).astype(jnp.float32)
    hi = jax.lax.dynamic_slice_in_dim(
        h2_im, p - head, p, axis=1).astype(jnp.float32)
    y_re = jnp.sum(fdl_re * hr - fdl_im * hi, axis=1)
    y_im = jnp.sum(fdl_re * hi + fdl_im * hr, axis=1)
    return _inverse_block(y_re, y_im, b), head, fdl_re, fdl_im


# --- Non-uniform (two-level Gardner) form ------------------------------


def nupols_tail_partitions(ir_length: int, block_size: int,
                           k: int) -> int:
    """Number of K*B-sized tail partitions (0 if the K-slot head
    covers the whole IR; callers fall back to the shift form then)."""
    head_taps = k * block_size
    if ir_length <= head_taps:
        return 0
    return -(-(ir_length - head_taps) // head_taps)


def nupols_spectra(ir: jax.Array, block_size: int, k: int):
    """(T, L) IRs -> (head, tail) partition spectra for the nupols
    form: head = exactly K partitions of B taps ((T, K, B+1) planes,
    zero-padded H past L), tail = M partitions of K*B taps
    ((T, M, K*B+1) planes). Requires L > K*B (else use the shift
    form; nupols_tail_partitions == 0 says so)."""
    t, l = ir.shape
    head_taps = k * block_size
    head_ir = jnp.zeros((t, head_taps), jnp.float32)
    head_ir = head_ir.at[:, : min(l, head_taps)].set(
        ir[:, :head_taps].astype(jnp.float32))
    head = partition_spectra(head_ir, block_size)
    tail = partition_spectra(
        ir[:, head_taps:].astype(jnp.float32), head_taps)
    return head, tail


def _mac_groups(m: int, k: int):
    """Statically split tail slots 1..m-1 into k contiguous groups
    (block phase -> slot range), sizes as even as integers allow."""
    slots = list(range(1, m))
    bounds, acc = [], 0
    for g in range(k):
        n = len(slots) // k + (1 if g < len(slots) % k else 0)
        bounds.append((1 + acc, 1 + acc + n))
        acc += n
    return bounds


def make_partconv_block_nupols(block_size: int, k: int, m: int):
    """Build the jitted nupols block for static (B, K, M).

    State pytree (all float32 except blk):
      prev        (T, B)      previous input block (head overlap-save)
      hfdl_re/im  (T, K, B+1) head FDL (shift form)
      blk         int32       block phase in [0, K)
      chunk_full  (T, K*B)    the PREVIOUS completed input chunk
      chunk_fill  (T, K*B)    the chunk being accumulated this window
      tfdl_re/im  (T, M, KB+1) tail FDL of chunk spectra, newest first
      acc_re/im   (T, KB+1)   spread partial MAC for the NEXT window
      tail_out    (T, K*B)    tail time-domain output, current window

    Returns block_fn(x, state, hh_re, hh_im, ht_re, ht_im) ->
    (y, state'). Module docstring has the schedule derivation; the
    fold-algebra golden and test_nupols_equals_shift_form pin it.
    """
    kb = k * block_size
    groups = _mac_groups(m, k)

    def _group_branch(lo, hi):
        def branch(tfdl_re, tfdl_im, ht_re, ht_im):
            if lo >= hi:
                t = tfdl_re.shape[0]
                z = jnp.zeros((t, kb + 1), jnp.float32)
                return z, z
            fr = tfdl_re[:, lo - 1: hi - 1]
            fi = tfdl_im[:, lo - 1: hi - 1]
            hr = ht_re[:, lo:hi].astype(jnp.float32)
            hi_ = ht_im[:, lo:hi].astype(jnp.float32)
            return (jnp.sum(fr * hr - fi * hi_, axis=1),
                    jnp.sum(fr * hi_ + fi * hr, axis=1))
        return branch

    branches = [_group_branch(lo, hi) for lo, hi in groups]

    @jax.jit
    def block_fn(x, state, hh_re, hh_im, ht_re, ht_im):
        (prev, hfdl_re, hfdl_im, blk, chunk_full, chunk_fill,
         tfdl_re, tfdl_im, acc_re, acc_im, tail_out) = state
        b = block_size

        # Head: the uniform shift form over the first K partitions.
        y_head, hfdl_re, hfdl_im = partconv_block(
            x, prev, hfdl_re, hfdl_im, hh_re, hh_im)

        # Window boundary (blk == 0): the chunk filled last window is
        # complete. Compute its spectrum, push it into the tail FDL,
        # finish the spread MAC with the newest (m=0) term, and emit
        # this window's tail output.
        def fire(ops):
            (chunk_full, chunk_fill, tfdl_re, tfdl_im,
             acc_re, acc_im, tail_out) = ops
            seg = jnp.concatenate([chunk_full, chunk_fill], axis=1)
            spec = jnp.fft.rfft(seg, axis=1)
            sre = spec.real.astype(jnp.float32)
            sim = spec.imag.astype(jnp.float32)
            tfdl_re = jnp.concatenate(
                [sre[:, None], tfdl_re[:, :-1]], axis=1)
            tfdl_im = jnp.concatenate(
                [sim[:, None], tfdl_im[:, :-1]], axis=1)
            h0r = ht_re[:, 0].astype(jnp.float32)
            h0i = ht_im[:, 0].astype(jnp.float32)
            y_re = acc_re + sre * h0r - sim * h0i
            y_im = acc_im + sre * h0i + sim * h0r
            tail_out = jnp.fft.irfft(
                jax.lax.complex(y_re, y_im), 2 * kb, axis=1
            )[:, kb:].astype(jnp.float32)
            zero = jnp.zeros_like(acc_re)
            return (chunk_fill, jnp.zeros_like(chunk_fill),
                    tfdl_re, tfdl_im, zero, zero, tail_out)

        ops = (chunk_full, chunk_fill, tfdl_re, tfdl_im,
               acc_re, acc_im, tail_out)
        (chunk_full, chunk_fill, tfdl_re, tfdl_im,
         acc_re, acc_im, tail_out) = jax.lax.cond(
            blk == 0, fire, lambda o: o, ops)

        # Spread MAC: this block's statically-assigned share of the
        # m >= 1 tail slots accumulates toward the NEXT window.
        pr, pi = jax.lax.switch(
            blk, branches, tfdl_re, tfdl_im, ht_re, ht_im)
        acc_re = acc_re + pr
        acc_im = acc_im + pi

        # Serve this block's slice of the tail output and accumulate
        # the input into the filling chunk.
        y = y_head + jax.lax.dynamic_slice_in_dim(
            tail_out, blk * b, b, axis=1)
        chunk_fill = jax.lax.dynamic_update_slice_in_dim(
            chunk_fill, x, blk * b, axis=1)
        blk = (blk + 1) % k

        return y, (x, hfdl_re, hfdl_im, blk, chunk_full, chunk_fill,
                   tfdl_re, tfdl_im, acc_re, acc_im, tail_out)

    return block_fn


def nupols_init_state(tracks: int, block_size: int, k: int, m: int):
    """Zero state pytree for make_partconv_block_nupols (host-side
    numpy; callers device_put the leaves)."""
    import numpy as np

    kb = k * block_size
    z = np.zeros
    return (z((tracks, block_size), np.float32),
            z((tracks, k, block_size + 1), np.float32),
            z((tracks, k, block_size + 1), np.float32),
            np.int32(0),
            z((tracks, kb), np.float32),
            z((tracks, kb), np.float32),
            z((tracks, m, kb + 1), np.float32),
            z((tracks, m, kb + 1), np.float32),
            z((tracks, kb + 1), np.float32),
            z((tracks, kb + 1), np.float32),
            z((tracks, kb), np.float32))
