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

    pool = rng.random(50000, dtype=np.float32)
    ph = rng.integers(0, 49000, 16).astype(np.int32)
    tmpl = np.zeros((16, 32), np.float32)
    ref = np.asarray(rndmem_gather(pool, ph, tmpl))
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(rndmem_gather_pallas(pool, ph, tmpl))
    np.testing.assert_array_equal(out, ref)
