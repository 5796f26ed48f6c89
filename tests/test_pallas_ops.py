"""Pallas TPU kernels vs XLA references, run in interpreter mode on CPU."""

import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from gpuaudiobench_tpu.ops.fdtd3d import fdtd3d_block, zero_fields
from gpuaudiobench_tpu.ops.fdtd3d_pallas import fdtd3d_block_pallas
from gpuaudiobench_tpu.ops.modal import modal_bank_xla
from gpuaudiobench_tpu.ops.modal_pallas import modal_bank_pallas


@pytest.mark.parametrize("m,t_out", [(4096, 32), (960, 32), (256, 8)])
def test_modal_pallas_matches_xla(rng, m, t_out):
    s = 32
    amp = rng.random(m, dtype=np.float32)
    w = 2 * np.pi * rng.random(m, dtype=np.float32) * 0.45
    cw, sw = np.cos(w).astype(np.float32), np.sin(w).astype(np.float32)
    re = (rng.random(m, dtype=np.float32) * 2 - 1).astype(np.float32)
    im = (rng.random(m, dtype=np.float32) * 2 - 1).astype(np.float32)
    ref, _, _ = modal_bank_xla(amp, cw, sw, re, im, s, t_out)
    with pltpu.force_tpu_interpret_mode():
        out, _, _ = modal_bank_pallas(amp, cw, sw, re, im, s, t_out)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_fdtd_pallas_matches_xla(rng):
    x = (rng.random((4, 8), dtype=np.float32) * 2 - 1).astype(np.float32)
    fields = zero_fields()
    ref, rp, *_ = fdtd3d_block(x, *fields)
    with pltpu.force_tpu_interpret_mode():
        out, op_, *_ = fdtd3d_block_pallas(x, *fields)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
    # final pressure field also matches
    np.testing.assert_allclose(np.asarray(op_), np.asarray(rp), atol=1e-6)


def test_modal_stream_continues_state(rng):
    from gpuaudiobench_tpu.ops.modal_pallas import modal_bank_stream

    m, t_out, s = 256, 32, 16
    amp = rng.random(m, dtype=np.float32)
    w = 2 * np.pi * rng.random(m, dtype=np.float32) * 0.45
    cw, sw = np.cos(w).astype(np.float32), np.sin(w).astype(np.float32)
    re = (rng.random(m, dtype=np.float32) * 2 - 1).astype(np.float32)
    im = (rng.random(m, dtype=np.float32) * 2 - 1).astype(np.float32)
    # reference: one long 2*s run via the XLA scan
    ref, _, _ = modal_bank_xla(amp, cw, sw, re, im, 2 * s, t_out)
    with pltpu.force_tpu_interpret_mode():
        outs, _, _ = modal_bank_stream(amp, cw, sw, re, im, s, t_out, 2,
                                       mode_tile=128)
    outs = np.asarray(outs)
    np.testing.assert_allclose(outs[0], np.asarray(ref)[:, :s], atol=1e-4)
    np.testing.assert_allclose(outs[1], np.asarray(ref)[:, s:], atol=1e-4)


def test_rndmem_pallas_matches_gather(rng):
    from gpuaudiobench_tpu.ops.rndmem import rndmem_gather
    from gpuaudiobench_tpu.ops.rndmem_pallas import rndmem_gather_pallas

    # Pool carries the POOL_PAD tail slack the kernel contract requires
    # (models/rndmem.py pads the same way); playheads stay inside the
    # logical 64k pool.
    from gpuaudiobench_tpu.ops.rndmem_pallas import POOL_PAD

    pool = rng.random(64 * 1024 + POOL_PAD, dtype=np.float32)
    # include edge cases: block-aligned, end-of-pool, row-aligned,
    # mid-row offsets; 32 tracks = one full DMA group
    edge = [0, 1024, 513, 1000, 64 * 1024 - 512, 2047, 12345, 777,
            128, 127, 129, 64 * 1024 - 513, 64 * 1024 - 640, 255,
            64 * 1024 - 768, 511]
    ph = np.concatenate([
        np.array(edge, np.int32),
        rng.integers(0, 64 * 1024 - 512, 16).astype(np.int32),
    ])
    tmpl = np.zeros((32, 512), np.float32)
    ref = np.asarray(rndmem_gather(pool, ph, tmpl))
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(rndmem_gather_pallas(pool, ph, tmpl))
    np.testing.assert_array_equal(out, ref)


@pytest.mark.parametrize("tps,slots", [(16, 3), (32, 4), (64, 2)])
def test_rndmem_pallas_pipeline_variants(rng, tps, slots):
    """The DMA-pipeline knobs (DMAs per step / scratch slots,
    tools/rndmem_tune.py's sweep axes) never change the gather's
    value."""
    from gpuaudiobench_tpu.ops.rndmem import rndmem_gather
    from gpuaudiobench_tpu.ops.rndmem_pallas import (
        POOL_PAD,
        rndmem_gather_pallas,
    )

    pool = rng.random(16 * 1024 + POOL_PAD, dtype=np.float32)
    ph = rng.integers(0, 16 * 1024 - 512, 64).astype(np.int32)
    tmpl = np.zeros((64, 512), np.float32)
    ref = np.asarray(rndmem_gather(pool, ph, tmpl))
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(rndmem_gather_pallas(
            pool, ph, tmpl, tracks_per_step=tps, n_slots=slots))
    np.testing.assert_array_equal(out, ref)


def test_rndmem_pallas_fallback_small_buffer(rng):
    from gpuaudiobench_tpu.ops.rndmem_pallas import rndmem_gather_pallas

    pool = rng.random(50000, dtype=np.float32)
    ph = rng.integers(0, 49000, 16).astype(np.int32)
    tmpl = np.zeros((16, 32), np.float32)
    out = np.asarray(rndmem_gather_pallas(pool, ph, tmpl))  # xla fallback
    for i, p in enumerate(ph):
        np.testing.assert_array_equal(out[:, i], pool[p:p + 32])


def test_dwg_pallas_matches_xla(rng):
    from gpuaudiobench_tpu.ops.dwg import dwg_block
    from gpuaudiobench_tpu.ops.dwg_pallas import dwg_block_pallas

    g_count, s, max_len = 6, 48, 40  # deliberately unaligned G and L
    lengths = np.array([5, 8, 12, 16, 33, 40], np.int32)
    in_taps = (lengths // 4).astype(np.int32)
    out_taps = (3 * lengths // 4).astype(np.int32)
    gains = rng.random(g_count, dtype=np.float32)
    refl = np.full(g_count, 0.99, np.float32)
    damp = np.full(g_count, 0.9999, np.float32)
    x = (rng.random(s, dtype=np.float32) * 2 - 1).astype(np.float32)
    fwd = (rng.random((g_count, max_len), dtype=np.float32) * 0.1).astype(np.float32)
    bwd = (rng.random((g_count, max_len), dtype=np.float32) * 0.1).astype(np.float32)

    ref_out, ref_f, ref_b = dwg_block(
        x, fwd, bwd, lengths, in_taps, out_taps, gains, refl, damp
    )
    with pltpu.force_tpu_interpret_mode():
        out, f_o, b_o = dwg_block_pallas(
            x, fwd, bwd, lengths, in_taps, out_taps, gains, refl, damp
        )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=1e-5)
    np.testing.assert_allclose(np.asarray(f_o), np.asarray(ref_f), atol=1e-6)
    np.testing.assert_allclose(np.asarray(b_o), np.asarray(ref_b), atol=1e-6)


def test_iir_cascade_pallas(rng):
    from gpuaudiobench_tpu.ops.iir import iir_biquad_xla, iir_cascade_pallas
    from gpuaudiobench_tpu.utils.data import biquad_lowpass_coefficients

    k, t, s = 4, 8, 32
    coeffs = np.stack(
        [np.array(biquad_lowpass_coefficients(0.25 - 0.02 * i), np.float32)
         for i in range(k)]
    )
    states = (rng.random((k, t, 2), dtype=np.float32) * 0.1).astype(np.float32)
    x = (rng.random((t, s), dtype=np.float32) * 2 - 1).astype(np.float32)
    # reference: chain of single-stage scans
    y = x
    zs = []
    for i in range(k):
        y, z = iir_biquad_xla(y, coeffs[i], states[i])
        zs.append(np.asarray(z))
    with pltpu.force_tpu_interpret_mode():
        yp, zp = iir_cascade_pallas(x, coeffs, states, track_block=8)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(y), atol=1e-5)
    np.testing.assert_allclose(np.asarray(zp), np.stack(zs), atol=1e-5)


def test_iir_cascade_systolic_matches_chain(rng):
    """The systolic-skew kernel computes the same per-(sample, stage)
    arithmetic as the per-sample chain form; only compiler FMA
    contraction may differ, so agreement is to ~1e-7, carried states
    included."""
    from gpuaudiobench_tpu.ops.iir import (
        iir_cascade_pallas,
        iir_cascade_pallas_chain,
    )
    from gpuaudiobench_tpu.utils.data import biquad_lowpass_coefficients

    for k, t, s in [(10, 8, 32), (1, 8, 16), (4, 16, 64)]:
        coeffs = np.stack(
            [np.array(biquad_lowpass_coefficients(0.3 - 0.02 * i),
                      np.float32) for i in range(k)]
        )
        states = (rng.random((k, t, 2), dtype=np.float32) * 0.1
                  ).astype(np.float32)
        x = (rng.random((t, s), dtype=np.float32) * 2 - 1).astype(np.float32)
        with pltpu.force_tpu_interpret_mode():
            ys, zs_ = iir_cascade_pallas(x, coeffs, states, track_block=t)
            yc, zc = iir_cascade_pallas_chain(x, coeffs, states,
                                              track_block=t)
        np.testing.assert_allclose(np.asarray(ys), np.asarray(yc),
                                   atol=1e-6, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(zs_), np.asarray(zc),
                                   atol=1e-6, rtol=1e-6)


@pytest.mark.parametrize("s,lengths", [
    # mixed long/short around S, incl. L == S and L just above/below
    (48, [100, 96, 48, 49, 5, 8, 33, 40, 47]),
    # all long (pure elementwise path, no pallas sub-call)
    (32, [40, 64, 33, 32]),
    # all short (pure one-hot path)
    (64, [5, 8, 12, 63]),
])
def test_dwg_arc_matches_xla(rng, s, lengths):
    from gpuaudiobench_tpu.ops.dwg import dwg_block
    from gpuaudiobench_tpu.ops.dwg_arc import dwg_block_arc

    lengths = np.array(lengths, np.int32)
    # pre-partition: long (L >= s) first, stable — the model does this
    order = np.argsort(lengths < s, kind="stable")
    lengths = lengths[order]
    n_long = int((lengths >= s).sum())
    shorts = lengths[lengths < s]
    n_rounds = int(-(-s // int(shorts.min()))) if shorts.size else 0
    g_count = len(lengths)
    max_len = int(lengths.max())
    in_taps = (lengths // 4).astype(np.int32)
    out_taps = (3 * lengths // 4).astype(np.int32)
    gains = rng.random(g_count, dtype=np.float32)
    refl = np.full(g_count, 0.99, np.float32)
    damp = np.full(g_count, 0.9999, np.float32)
    x = (rng.random(s, dtype=np.float32) * 2 - 1).astype(np.float32)
    fwd = (rng.random((g_count, max_len), dtype=np.float32) * 0.1).astype(np.float32)
    bwd = (rng.random((g_count, max_len), dtype=np.float32) * 0.1).astype(np.float32)

    # two chained blocks so the carried-rail path is exercised too
    ref_out, ref_f, ref_b = dwg_block(
        x, fwd, bwd, lengths, in_taps, out_taps, gains, refl, damp
    )
    ref_out2, ref_f2, ref_b2 = dwg_block(
        x, ref_f, ref_b, lengths, in_taps, out_taps, gains, refl, damp
    )
    with pltpu.force_tpu_interpret_mode():
        out, f_o, b_o = dwg_block_arc(
            x, fwd, bwd, lengths, in_taps, out_taps, gains, refl, damp,
            n_long=n_long, n_rounds=n_rounds,
        )
        out2, f_o2, b_o2 = dwg_block_arc(
            x, np.asarray(f_o), np.asarray(b_o), lengths, in_taps, out_taps,
            gains, refl, damp, n_long=n_long, n_rounds=n_rounds,
        )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out), atol=1e-5)
    np.testing.assert_allclose(np.asarray(f_o), np.asarray(ref_f), atol=1e-6)
    np.testing.assert_allclose(np.asarray(b_o), np.asarray(ref_b), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref_out2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(f_o2), np.asarray(ref_f2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(b_o2), np.asarray(ref_b2), atol=1e-6)


@pytest.mark.parametrize("t,s,l", [(4, 32, 8), (130, 48, 16), (8, 64, 7)])
def test_conv1d_pallas_matches_xla(rng, t, s, l):
    from gpuaudiobench_tpu.ops.conv import conv1d_direct

    x = rng.standard_normal((t, s), dtype=np.float32)
    ir = (rng.standard_normal((t, l), dtype=np.float32) * 0.1).astype(np.float32)
    for mode in ("clamp", "bleed"):
        ref = np.asarray(conv1d_direct(x, ir, mode, impl="xla"))
        with pltpu.force_tpu_interpret_mode():
            out = np.asarray(conv1d_direct(x, ir, mode, impl="pallas"))
        np.testing.assert_allclose(out, ref, atol=1e-5)


@pytest.mark.parametrize("s,lengths", [
    (48, [100, 96, 48, 49, 5, 8, 33, 40, 47]),
    (32, [40, 64, 33, 32]),
    (64, [5, 8, 12, 63]),
])
def test_dwg_stream_matches_positional(rng, s, lengths):
    """Chained dwg_stream_step blocks reproduce chained positional
    dwg_block blocks exactly (the aligned carry is a re-representation,
    not an approximation)."""
    from gpuaudiobench_tpu.ops.dwg import dwg_block
    from gpuaudiobench_tpu.ops.dwg_arc import dwg_stream_entry, dwg_stream_step

    lengths = np.array(lengths, np.int32)
    order = np.argsort(lengths < s, kind="stable")
    lengths = lengths[order]
    n_long = int((lengths >= s).sum())
    shorts = lengths[lengths < s]
    n_rounds = int(-(-s // int(shorts.min()))) if shorts.size else 0
    g_count = len(lengths)
    max_len = int(lengths.max())
    in_taps = (lengths // 4).astype(np.int32)
    out_taps = (3 * lengths // 4).astype(np.int32)
    gains = rng.random(g_count, dtype=np.float32)
    refl = np.full(g_count, 0.99, np.float32)
    damp = np.full(g_count, 0.9999, np.float32)
    x = (rng.random(s, dtype=np.float32) * 2 - 1).astype(np.float32)
    fwd = (rng.random((g_count, max_len), dtype=np.float32) * 0.1).astype(np.float32)
    bwd = (rng.random((g_count, max_len), dtype=np.float32) * 0.1).astype(np.float32)

    sf, sb = dwg_stream_entry(fwd, bwd, lengths, s)
    ref_f, ref_b = fwd, bwd
    for _ in range(3):
        ref_out, ref_f, ref_b = dwg_block(
            x, ref_f, ref_b, lengths, in_taps, out_taps, gains, refl, damp
        )
        out, sf, sb = dwg_stream_step(
            x, np.asarray(sf), np.asarray(sb), lengths, in_taps, out_taps,
            gains, refl, damp, n_long=n_long, n_rounds=n_rounds,
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref_out), atol=1e-6
        )


def test_fdtd_div_form_matches_field_form(rng):
    """The divergence-form kernel (carry p + div(v)) reproduces the
    field-form update over chained blocks: same algebra, reassociated."""
    from gpuaudiobench_tpu.ops.fdtd3d_pallas import (
        fdtd3d_block_pallas_div,
        zero_fields_div,
    )

    x = (rng.random((4, 8), dtype=np.float32) * 2 - 1).astype(np.float32)
    fields = zero_fields()
    dfields = zero_fields_div()
    for _ in range(2):  # chained blocks exercise the carried div state
        ref, *fields = fdtd3d_block(x, *fields)
        with pltpu.force_tpu_interpret_mode():
            out, *dfields = fdtd3d_block_pallas_div(
                x, *(np.asarray(f) for f in dfields)
            )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
        # Streaming contract of the homogeneous-interior substep: the
        # junk it accumulates on non-interior cells must be re-masked
        # away at every block boundary (carried div == 0 off-interior),
        # or indefinite streaming would grow the carry without bound.
        div = np.asarray(dfields[1])
        n = div.shape[0]
        interior = np.zeros_like(div, dtype=bool)
        interior[1:n - 1, 1:n - 1, 1:n - 1] = True
        assert np.all(div[~interior] == 0.0)
    # carried pressure fields agree too
    np.testing.assert_allclose(
        np.asarray(dfields[0]), np.asarray(fields[0]), atol=1e-6
    )


def test_fdtd_vmem_budget_scales_with_grid():
    """The Mosaic scoped-VMEM request must cover the measured working
    set at every legal --fdtdRoom (room 80 = 19.9 MiB measured, the
    default 16 MiB limit failed to compile) while never exceeding
    physical VMEM."""
    from gpuaudiobench_tpu.config import BenchConfig
    from gpuaudiobench_tpu.ops import fdtd3d as C
    from gpuaudiobench_tpu.ops.fdtd3d_pallas import _vmem_limit_bytes

    # Reference room: default limit untouched (archived r2/r3 suite
    # numbers compiled under it).
    assert _vmem_limit_bytes(C.GRID_N + 1, 12) == 16 << 20
    # The measured failure point: budget must exceed the 19.9 MiB
    # working set Mosaic reported at room 80 (pad 83).
    assert _vmem_limit_bytes(83, 12) > int(19.9 * (1 << 20))
    prev = 0
    for room in range(8, 129, 2):  # the BenchConfig-legal knob range
        pad = room + 2 + 1
        lim = _vmem_limit_bytes(pad, 12)
        assert lim >= prev  # monotone in grid size
        assert 16 << 20 <= lim <= 127 << 20
        prev = lim
    BenchConfig(fdtd_room=128)  # the range above matches the config gate


def test_modal_sample_unroll_divides():
    """_sample_unroll must return a divisor of the buffer (the kernel
    indexes out_ref at ng*unroll without a tail loop) capped at
    min(128, S/2) -- full-buffer unroll measurably regresses at every
    size (whole-buffer contrib concat)."""
    from gpuaudiobench_tpu.ops.modal_pallas import _sample_unroll

    for s in (32, 48, 64, 100, 128, 256, 512, 4096):
        u = _sample_unroll(s)
        assert s % u == 0 and 1 <= u <= 128
        assert u < s or s <= 2  # never the full buffer
    assert _sample_unroll(512) == 128
    assert _sample_unroll(256) == 128
    assert _sample_unroll(128) == 64
    assert _sample_unroll(64) == 32
    assert _sample_unroll(48) == 16
    assert _sample_unroll(100) == 4
    assert _sample_unroll(7) == 1


def test_modal_resonator_matches_rotation(rng):
    """The Gordon-Smith resonator kernel tracks the rotation kernel
    (the two shears compose to a rotation by the same angle up to eps
    quantization), including chained blocks through the carried
    resonator state. Agreement is phase-drift-limited -- ~1e-4
    relative-to-peak per 512 samples -- which is exactly why "res" is
    an opt-in algorithm, not the validated default (see
    test_modal_true_sinusoid_honesty)."""
    from gpuaudiobench_tpu.ops.modal_pallas import (
        modal_folded_step,
        modal_res_step,
        res_init,
    )

    m, t_out, s = 512, 32, 32
    amp = rng.random(m, dtype=np.float32)
    w = 2 * np.pi * rng.random(m, dtype=np.float32) * 0.45
    cw, sw = np.cos(w).astype(np.float32), np.sin(w).astype(np.float32)
    re = (rng.random(m, dtype=np.float32) * 2 - 1).astype(np.float32)
    im = (rng.random(m, dtype=np.float32) * 2 - 1).astype(np.float32)
    re_f, im_f = amp * re, amp * im
    with pltpu.force_tpu_interpret_mode():
        ref1, re2, im2 = modal_folded_step(cw, sw, re_f, im_f, s, t_out, m)
        ref2, _, _ = modal_folded_step(cw, sw, re2, im2, s, t_out, m)
        eps, y0, q0 = res_init(cw, sw, re_f, im_f)
        out1, y1, q1 = modal_res_step(eps, y0, q0, s, t_out, m)
        out2, _, _ = modal_res_step(eps, y1, q1, s, t_out, m)
    peak = np.abs(np.asarray(ref1)).max()
    assert np.abs(np.asarray(out1) - np.asarray(ref1)).max() < 2e-4 * peak
    assert np.abs(np.asarray(out2) - np.asarray(ref2)).max() < 4e-4 * peak


def test_modal_gs_golden_matches_pallas(rng):
    """The GS NumPy golden (models/modal.py modal_reference_gs) mirrors
    the resonator kernel's f32 sequence."""
    from gpuaudiobench_tpu.models.modal import modal_reference_gs
    from gpuaudiobench_tpu.ops.modal_pallas import modal_bank_pallas

    m, t_out, s = 1024, 32, 64
    amp = rng.random(m, dtype=np.float32)
    w = 2 * np.pi * rng.random(m, dtype=np.float32) * 0.45
    cw, sw = np.cos(w).astype(np.float32), np.sin(w).astype(np.float32)
    re = (rng.random(m, dtype=np.float32) * 2 - 1).astype(np.float32)
    im = (rng.random(m, dtype=np.float32) * 2 - 1).astype(np.float32)
    ref = modal_reference_gs(amp, cw, sw, re, im, s, t_out)
    with pltpu.force_tpu_interpret_mode():
        out, _, _ = modal_bank_pallas(amp, cw, sw, re, im, s, t_out,
                                      algorithm="res")
    peak = np.abs(ref).max()
    assert np.abs(np.asarray(out) - ref).max() <= 1e-5 * peak


def test_modal_true_sinusoid_honesty(rng):
    """Why rotation is the validated default: against the exact f64
    sinusoid bank defined by the stored (cos, sin) coefficients, the
    f32 rotation drifts only ~1e-6 relative-to-peak at 512 samples
    (it applies those very coefficients), while the GS resonator's
    single-f32 eps quantization drifts ~3e-4 -- still -70 dB
    (inaudible; frequency error ~0.0003 cents) but 200x further, so
    "res" stays an opt-in trade (measured only ~14% faster at 1M modes:
    the kernel is fold/VMEM-bound, not flop-bound)."""
    from gpuaudiobench_tpu.models.modal import (
        modal_reference,
        modal_reference_gs,
    )

    m, t_out, s = 2048, 32, 512
    amp = rng.random(m, dtype=np.float32)
    w64 = 2 * np.pi * rng.random(m) * 0.45
    cw = np.cos(w64).astype(np.float32)
    sw = np.sin(w64).astype(np.float32)
    re = (rng.random(m, dtype=np.float32) * 2 - 1).astype(np.float32)
    im = (rng.random(m, dtype=np.float32) * 2 - 1).astype(np.float32)

    # exact f64 bank from the QUANTIZED rotation coefficients' angle
    theta = np.arctan2(sw.astype(np.float64), cw.astype(np.float64))
    r = np.hypot(cw.astype(np.float64), sw.astype(np.float64))
    n = np.arange(1, s + 1)[:, None]
    phases = theta[None, :] * n
    radii = r[None, :] ** n
    vals = amp.astype(np.float64) * radii * (
        re * np.cos(phases) - im * np.sin(phases)
    )
    exact = vals.reshape(s, m // t_out, t_out).sum(axis=1).T  # (T, S)

    rot = modal_reference(amp, cw, sw, re, im, s, t_out)
    gs = modal_reference_gs(amp, cw, sw, re, im, s, t_out)
    peak = np.abs(exact).max()
    err_rot = np.abs(rot - exact).max() / peak
    err_gs = np.abs(gs - exact).max() / peak
    assert err_rot < 1e-5, err_rot
    assert err_gs < 5e-4, err_gs


@pytest.mark.parametrize("s", [32, 64, 128, 256, 1024])
def test_rndmem_pallas_buffer_sizes(rng, s):
    """The generalized kernel covers every CLI buffer size (sub-128
    buffers ride the 128-wide cut and slice; 1024 fetches 16 rows)."""
    from gpuaudiobench_tpu.ops.rndmem import rndmem_gather
    from gpuaudiobench_tpu.ops.rndmem_pallas import (
        POOL_PAD,
        rndmem_gather_pallas,
    )

    logical = 32 * 1024
    pool = rng.random(logical + POOL_PAD, dtype=np.float32)
    ph = np.concatenate([
        np.array([0, 127, 128, 1023, logical - s, logical - s - 1],
                 np.int32),
        rng.integers(0, logical - s, 26).astype(np.int32),
    ])
    tmpl = np.zeros((32, s), np.float32)
    ref = np.asarray(rndmem_gather(pool, ph, tmpl))
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(rndmem_gather_pallas(pool, ph, tmpl))
    np.testing.assert_array_equal(out, ref)


@pytest.mark.parametrize("tracks,s,m", [(8, 128, 128), (8, 256, 64),
                                        (640, 128, 128)])
def test_iir_blockstate_pallas_matches_sequential(rng, tracks, s, m):
    """The block-state Pallas kernel is the SAME filter as the
    sequential scan (<= 1e-5 abs incl. carried state across blocks and
    the padded-tracks fallback path at 640 tracks)."""
    from gpuaudiobench_tpu.ops.iir import (
        blockstate_tables,
        iir_biquad_blockstate_pallas,
        iir_biquad_xla,
    )
    from gpuaudiobench_tpu.utils.data import biquad_lowpass_coefficients
    import jax.numpy as jnp

    coeffs = biquad_lowpass_coefficients(0.25)
    c = jnp.asarray(np.array(coeffs, np.float32))
    x = (rng.random((tracks, s), dtype=np.float32) * 2 - 1)
    z0 = (rng.random((tracks, 2), dtype=np.float32) - 0.5)
    taps, u = blockstate_tables(coeffs, m)
    zp, zr = jnp.asarray(z0), jnp.asarray(z0)
    for _ in range(3):  # carried state across 3 blocks
        with pltpu.force_tpu_interpret_mode():
            yp, zp = iir_biquad_blockstate_pallas(
                jnp.asarray(x), c, jnp.asarray(taps), jnp.asarray(u), zp)
        yr, zr = iir_biquad_xla(jnp.asarray(x), c, zr)
    np.testing.assert_allclose(np.asarray(yp), np.asarray(yr), atol=1e-5)
    np.testing.assert_allclose(np.asarray(zp), np.asarray(zr), atol=1e-4)
