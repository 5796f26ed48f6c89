"""Deterministic test-data and filter/IR design utilities.

Ports the data-generation surface of cuda/bench_utils.cu:

* generate_random_audio: mt19937 uniform(-1,1), seed 42
  (bench_utils.cu:238-245). NumPy's MT19937 stream differs from
  libstdc++'s distribution rollout, but determinism + range match; all
  goldens are recomputed from the actual generated data so validation is
  stream-independent.
* generate_impulse_response: windowed sinc with Rect/Hamming/Hann/
  Blackman windows, L1-normalized (bench_utils.cu:247-295).
* conv1d_impulse_responses: the Conv1D benchmark's per-track IR bank
  (bench_conv1d.cu:159-181): freq = 0.1 + 0.05*track/nTracks, Hamming
  window over i/(L-1), sinc = sin(2*pi*f*t)/(2*pi*f*t) with
  t = i - L/2, scaled by 1/L (not L1-normalized).
* biquad_lowpass_coefficients: RBJ/Butterworth lowpass at normalized
  frequency, Q=0.707 (bench_iir.cu:199-226).
* generate_test_pattern: zeros/ones/ramp/sine/noise
  (bench_utils.cu:297-323).
"""

from __future__ import annotations

import numpy as np


def _rng(seed: int) -> np.random.Generator:
    return np.random.Generator(np.random.MT19937(seed))


def generate_random_audio(n: int, seed: int = 42) -> np.ndarray:
    """Uniform [-1, 1) float32 audio samples (bench_utils.cu:238-245)."""
    g = _rng(seed)
    return (g.random(n, dtype=np.float32) * 2.0 - 1.0).astype(np.float32)


def generate_uniform01(n: int, seed: int = 42) -> np.ndarray:
    """Uniform [0, 1) float32 (rand()/RAND_MAX patterns, e.g.
    bench_datatransfer.cu:61, bench_rndmem.cu:143)."""
    g = _rng(seed)
    return g.random(n, dtype=np.float32)


def generate_test_pattern(n: int, pattern: str, seed: int = 42) -> np.ndarray:
    """zeros/ones/ramp/sine/noise test patterns (bench_utils.cu:297-323)."""
    if pattern == "zeros":
        return np.zeros(n, dtype=np.float32)
    if pattern == "ones":
        return np.ones(n, dtype=np.float32)
    if pattern == "ramp":
        return (np.arange(n, dtype=np.float32) / max(n - 1, 1)).astype(np.float32)
    if pattern == "sine":
        i = np.arange(n, dtype=np.float32)
        return np.sin(2.0 * np.pi * 440.0 * i / 48000.0).astype(np.float32)
    if pattern == "noise":
        return generate_random_audio(n, seed)
    if pattern == "pink":
        return generate_pink_noise(n, seed)
    if pattern == "impulse":
        return generate_impulse(n)
    if pattern == "step":
        return generate_step(n)
    raise ValueError(f"unknown test pattern: {pattern}")


_WINDOWS = ("rectangular", "hamming", "hann", "blackman", "kaiser")


def generate_impulse_response(
    length: int, frequency: float, window: str = "hamming",
    kaiser_beta: float = 8.0,
) -> np.ndarray:
    """L1-normalized windowed-sinc lowpass IR (bench_utils.cu:247-295;
    Kaiser from the Metal generator's window set,
    BenchmarkUtilities.swift:299-326 -- the reference ships a sinh
    "simplified Kaiser (approximate)"; we use the standard
    I0(beta*sqrt(1-x^2))/I0(beta) form, which the approximation
    stands in for)."""
    if window not in _WINDOWS:
        raise ValueError(f"unknown window: {window}")
    i = np.arange(length, dtype=np.float64)
    t = i - length / 2.0
    arg = 2.0 * np.pi * frequency * t
    sinc = np.where(t == 0.0, 1.0, np.sin(arg) / np.where(arg == 0.0, 1.0, arg))
    n = i / max(length - 1, 1)
    if window == "rectangular":
        w = np.ones_like(n)
    elif window == "hamming":
        w = 0.54 - 0.46 * np.cos(2.0 * np.pi * n)
    elif window == "hann":
        w = 0.5 * (1.0 - np.cos(2.0 * np.pi * n))
    elif window == "blackman":
        w = 0.42 - 0.5 * np.cos(2.0 * np.pi * n) + 0.08 * np.cos(4.0 * np.pi * n)
    else:  # kaiser
        x = 2.0 * n - 1.0  # [-1, 1] across the window
        w = np.i0(kaiser_beta * np.sqrt(np.maximum(0.0, 1.0 - x * x)))
        w = w / np.i0(kaiser_beta)
    ir = (sinc * w).astype(np.float32)
    s = np.abs(ir).sum()
    if s > 0:
        ir = ir / s
    return ir.astype(np.float32)


def conv1d_impulse_responses(track_count: int, ir_length: int) -> np.ndarray:
    """Per-track windowed-sinc IR bank, (tracks, ir_length) float32
    (bench_conv1d.cu:159-181; same generator used by Conv1D_accel)."""
    tracks = np.arange(track_count, dtype=np.float32)[:, None]
    i = np.arange(ir_length, dtype=np.float32)[None, :]
    freq = 0.1 + 0.05 * tracks / np.float32(track_count)
    t = i - np.float32(ir_length) / 2.0
    window = 0.54 - 0.46 * np.cos(
        2.0 * np.float32(np.pi) * i / np.float32(ir_length - 1)
    )
    arg = 2.0 * np.float32(np.pi) * freq * t
    sinc = np.where(t == 0.0, np.float32(1.0), np.sin(arg) / np.where(arg == 0.0, 1.0, arg))
    return (window * sinc / np.float32(ir_length)).astype(np.float32)


def biquad_lowpass_coefficients(normalized_frequency: float, q: float = 0.707):
    """2nd-order Butterworth lowpass biquad, a0-normalized, as
    (b0, b1, b2, a1, a2) float32 (bench_iir.cu:199-226)."""
    omega = 2.0 * np.pi * normalized_frequency
    cos_w = np.cos(omega)
    sin_w = np.sin(omega)
    alpha = sin_w / (2.0 * q)
    b0 = (1.0 - cos_w) / 2.0
    b1 = 1.0 - cos_w
    b2 = (1.0 - cos_w) / 2.0
    a0 = 1.0 + alpha
    a1 = -2.0 * cos_w
    a2 = 1.0 - alpha
    return tuple(np.float32(v / a0) for v in (b0, b1, b2, a1, a2))


def generate_pink_noise(n: int, seed: int = 42) -> np.ndarray:
    """Pink noise via the Paul Kellet economy filter over white noise
    (BenchmarkUtilities.swift:182-328 AudioDataGenerator.pink)."""
    white = generate_random_audio(n, seed).astype(np.float64)
    b0 = b1 = b2 = 0.0
    out = np.empty(n, np.float64)
    for i, w in enumerate(white):
        b0 = 0.99765 * b0 + w * 0.0990460
        b1 = 0.96300 * b1 + w * 0.2965164
        b2 = 0.57000 * b2 + w * 1.0526913
        out[i] = b0 + b1 + b2 + w * 0.1848
    peak = np.abs(out).max() or 1.0
    return (out / peak).astype(np.float32)


def generate_impulse(n: int) -> np.ndarray:
    """Unit impulse at sample 0 (BufferManager.js test patterns)."""
    out = np.zeros(n, np.float32)
    if n:
        out[0] = 1.0
    return out


def generate_step(n: int) -> np.ndarray:
    """Unit step from the midpoint (BufferManager.js test patterns)."""
    out = np.zeros(n, np.float32)
    out[n // 2:] = 1.0
    return out


def reverb_impulse_responses(
    track_count: int, ir_length: int, seed: int = 42
) -> np.ndarray:
    """(T, L) exponentially decaying noise IRs, the canonical synthetic
    room response (60 dB decay over the full length, i.e. T60 = L/fs),
    L2-normalized per track so output level is track-independent.

    For the PartConv extension: unlike conv1d_impulse_responses
    (windowed sincs, matching the reference's short-IR benchmarks), a
    convolution-reverb IR is broadband and decaying; the seeded
    generator keeps goldens deterministic (seed 42 everywhere,
    bench_utils.cu:238).
    """
    g = _rng(seed)
    noise = (g.random((track_count, ir_length), dtype=np.float32) * 2.0
             - 1.0)
    t = np.arange(ir_length, dtype=np.float32)
    decay = np.exp(np.float32(np.log(1e-3)) * t
                   / np.float32(max(ir_length - 1, 1)))
    ir = noise * decay[None, :]
    norm = np.sqrt((ir.astype(np.float64) ** 2).sum(axis=1, keepdims=True))
    return (ir / np.maximum(norm, 1e-12)).astype(np.float32)
