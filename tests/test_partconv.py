"""PartConv: uniformly-partitioned overlap-save streaming convolution.

The fold-algebra golden is itself proven against a brute-force stream
convolution first; the device path is then validated against the
golden across iterations, IR/block-size edge cases, and the
runner/streaming integration.
"""

import numpy as np
import pytest

from gpuaudiobench_tpu.config import BenchConfig
from gpuaudiobench_tpu.models.partconv import (
    PartConvBenchmark,
    partconv_reference,
)
from gpuaudiobench_tpu.ops.partconv import num_partitions
from gpuaudiobench_tpu.utils.data import reverb_impulse_responses


def brute_force_block(x: np.ndarray, ir: np.ndarray, k: int) -> np.ndarray:
    """Output block k of the stream that repeats x every block, by
    explicit full linear convolution (the definition)."""
    t, b = x.shape
    stream = np.tile(x.astype(np.float64), (1, k))
    out = np.empty((t, b), np.float64)
    for tr in range(t):
        full = np.convolve(stream[tr], ir[tr].astype(np.float64))
        out[tr] = full[(k - 1) * b: k * b]
    return out.astype(np.float32)


@pytest.mark.parametrize("k", [1, 2, 3, 5, 8])
@pytest.mark.parametrize("ir_len", [5, 8, 19, 24, 40])
def test_reference_matches_bruteforce(k, ir_len):
    rng = np.random.default_rng(7)
    b, t = 8, 2
    x = rng.standard_normal((t, b)).astype(np.float32)
    ir = rng.standard_normal((t, ir_len)).astype(np.float32)
    ref = partconv_reference(x, ir, k, b)
    brute = brute_force_block(x, ir, k)
    np.testing.assert_allclose(ref, brute, rtol=0, atol=1e-5)


def _bench(**over):
    cfg = BenchConfig(n_runs=2, warmup=1, write_latencies=False,
                      quiet=True, device_timing=False, **over)
    b = PartConvBenchmark(cfg)
    b.setup()
    return b


def test_device_matches_golden_over_iterations():
    b = _bench(n_tracks=4, buffer_size=64, ir_length=200)
    assert b.partitions == num_partitions(200, 64) == 4
    for _ in range(5):  # setup ran one; total 6 spans past P
        b.iterate()
    v = b.validate()
    assert v.passed, v.messages


def test_short_ir_single_partition():
    b = _bench(n_tracks=2, buffer_size=64, ir_length=32)
    assert b.partitions == 1
    b.iterate()
    assert b.validate().passed


def test_ir_not_multiple_of_block():
    b = _bench(n_tracks=2, buffer_size=32, ir_length=77)
    assert b.partitions == 3
    for _ in range(4):
        b.iterate()
    assert b.validate().passed


def test_steady_state_is_periodic():
    """Past k = P+1 the output of the repeated-block stream is
    block-periodic: two extra iterations must change nothing."""
    x = np.random.default_rng(3).standard_normal((2, 16)).astype(np.float32)
    ir = reverb_impulse_responses(2, 40, seed=1)
    y1 = partconv_reference(x, ir, 5, 16)   # P = 3, so k=5 is steady
    y2 = partconv_reference(x, ir, 7, 16)
    np.testing.assert_allclose(y1, y2, atol=1e-6)


def test_runner_end_to_end_with_streaming():
    from gpuaudiobench_tpu.harness.runner import run_benchmark
    from gpuaudiobench_tpu.registry import create_benchmark

    cfg = BenchConfig(n_runs=2, warmup=1, n_tracks=4, buffer_size=64,
                      ir_length=256, pipeline_depth=4, saturated_reps=3,
                      write_latencies=False, quiet=True,
                      device_timing=False)
    b = create_benchmark("PartConv", cfg)
    b.setup()
    r = run_benchmark(b, cfg, verbose=False)
    assert r.validation.passed, r.validation.messages
    assert r.saturated_statistics is not None
    assert r.metadata["partitions"] == 4


def test_ring_equals_shift_form():
    """The ring-buffer FDL and the textbook shift form (default) are
    the same filter: identical outputs over > P blocks."""
    import jax.numpy as jnp

    from gpuaudiobench_tpu.ops.partconv import (
        partconv_block,
        partconv_block_ring,
        partition_spectra,
        ring_aligned_spectra,
    )

    rng = np.random.default_rng(11)
    t, b, length = 3, 16, 55  # P = 4
    p = num_partitions(length, b)
    ir = rng.standard_normal((t, length)).astype(np.float32)
    h_re, h_im = partition_spectra(jnp.asarray(ir), b)
    h2_re, h2_im = ring_aligned_spectra(h_re, h_im)  # ring takes H2
    fdl = np.zeros((t, p, b + 1), np.float32)
    prev_s = jnp.zeros((t, b)); fre_s = jnp.asarray(fdl); fim_s = jnp.asarray(fdl)
    prev_r = jnp.zeros((t, b)); fre_r = jnp.asarray(fdl); fim_r = jnp.asarray(fdl)
    head = np.int32(p - 1)
    for k in range(p + 3):
        x = jnp.asarray(rng.standard_normal((t, b)).astype(np.float32))
        ys, fre_s, fim_s = partconv_block(
            x, prev_s, fre_s, fim_s, h_re, h_im)
        yr, head, fre_r, fim_r = partconv_block_ring(
            x, prev_r, head, fre_r, fim_r, h2_re, h2_im)
        prev_s = prev_r = x
        # Same filter, different f32 summation order over partitions:
        # agreement to 1e-5 of the block's peak (measured ~1e-7).
        ys, yr = np.asarray(ys), np.asarray(yr)
        np.testing.assert_allclose(ys, yr,
                                   atol=1e-5 * np.abs(ys).max(),
                                   err_msg=f"block {k}")


def test_verification_none_skips_golden(monkeypatch):
    """verification='none' must not pay the fold-algebra golden
    (capacity probes search large track counts)."""
    import gpuaudiobench_tpu.models.partconv as pc

    def boom(*a, **k):
        raise AssertionError("golden computed despite verification=none")

    monkeypatch.setattr(pc, "partconv_reference", boom)
    b = _bench(n_tracks=2, buffer_size=32, ir_length=64,
               verification="none")
    b.iterate()
    v = b.validate()
    assert v.passed  # SKIPPED counts as non-failure


def test_shift_form_selectable_and_validates():
    b = _bench(n_tracks=2, buffer_size=32, ir_length=100,
               partconv_form="shift")
    for _ in range(4):
        b.iterate()
    assert b.validate().passed
    assert b.metadata()["form"] == "shift"


def test_f16_spectra_validate_at_full_partition_depth():
    """--partconvHDtype f16 must stay inside the 1e-3 contract at the
    REAL accumulation depth (94 partitions of the 1 s default IR) --
    the measured margin is ~5x (1.9e-4); bf16 was measured at 1.59e-3
    and rejected (docs/BENCHMARKS.md)."""
    b = _bench(n_tracks=2, buffer_size=512, ir_length=48000,
               partconv_h_dtype="f16")
    assert b.partitions == 94
    b.iterate()
    v = b.validate()
    assert v.passed, v.messages
    assert b.metadata()["hDtype"] == "f16"
    # the narrower storage must be charged in the cost model
    cfg_f32 = b.cfg.replace(partconv_h_dtype="f32")
    b32 = PartConvBenchmark(cfg_f32)
    b32.ir_length, b32.partitions = b.ir_length, b.partitions
    assert b.cost_model()["hbm_bytes"] < b32.cost_model()["hbm_bytes"]


def test_invalid_h_dtype_rejected():
    with pytest.raises(ValueError):
        BenchConfig(partconv_h_dtype="bf16").validate()


def test_invalid_form_rejected():
    with pytest.raises(ValueError):
        BenchConfig(partconv_form="circular").validate()


def test_registered_as_dsp_extension():
    from gpuaudiobench_tpu.registry import (
        BENCHMARK_DESCRIPTIONS,
        CATEGORIES,
        EXTENSION_NAMES,
        list_benchmarks,
    )

    assert "PartConv" in EXTENSION_NAMES
    assert "PartConv" in CATEGORIES["dsp"]
    assert "PartConv" in BENCHMARK_DESCRIPTIONS
    assert "PartConv" in list_benchmarks()


def test_reverb_ir_properties():
    ir = reverb_impulse_responses(3, 1000, seed=42)
    assert ir.shape == (3, 1000)
    # L2-normalized per track
    np.testing.assert_allclose((ir.astype(np.float64) ** 2).sum(axis=1),
                               1.0, rtol=1e-5)
    # decays ~60 dB: late-tail envelope far below early envelope
    early = np.abs(ir[:, :50]).max(axis=1)
    late = np.abs(ir[:, -50:]).max(axis=1)
    assert (late < early * 0.01).all()
    # deterministic for a seed
    np.testing.assert_array_equal(ir, reverb_impulse_responses(3, 1000,
                                                               seed=42))


# --- nupols (two-level Gardner) form ------------------------------------


def test_nupols_tail_partition_math():
    from gpuaudiobench_tpu.ops.partconv import nupols_tail_partitions

    assert nupols_tail_partitions(256, 8, 4) == 7  # head 32, tail 224/32
    assert nupols_tail_partitions(33, 8, 4) == 1   # one tap past the head
    assert nupols_tail_partitions(32, 8, 4) == 0   # head covers exactly
    assert nupols_tail_partitions(16, 8, 4) == 0


def test_nupols_equals_shift_form():
    """The two-level Gardner form is the same linear filter as the
    uniform shift form: identical outputs block-by-block over several
    full tail windows, on a RANDOM (non-repeated) input stream."""
    import jax.numpy as jnp

    from gpuaudiobench_tpu.ops.partconv import (
        make_partconv_block_nupols,
        nupols_init_state,
        nupols_spectra,
        nupols_tail_partitions,
        partconv_block,
        partition_spectra,
    )

    rng = np.random.default_rng(7)
    t, b, k = 3, 8, 4
    length = 150  # head 32 taps, M = ceil(118/32) = 4 tail partitions
    m = nupols_tail_partitions(length, b, k)
    assert m == 4
    ir = rng.standard_normal((t, length)).astype(np.float32)

    # Uniform shift oracle.
    p = num_partitions(length, b)
    h_re, h_im = partition_spectra(jnp.asarray(ir), b)
    prev_s = jnp.zeros((t, b))
    fre_s = jnp.zeros((t, p, b + 1)); fim_s = jnp.zeros((t, p, b + 1))

    # nupols under test.
    (hh_re, hh_im), (ht_re, ht_im) = nupols_spectra(jnp.asarray(ir), b, k)
    assert hh_re.shape == (t, k, b + 1)
    # tail H is padded to 1 + K*L entries (static spread-MAC windows)
    from gpuaudiobench_tpu.ops.partconv import nupols_group_len

    ell = nupols_group_len(m, k)
    assert ht_re.shape == (t, 1 + k * ell, k * b + 1)
    assert np.all(np.asarray(ht_re)[:, m:] == 0)
    block = make_partconv_block_nupols(b, k, m)
    state = tuple(jnp.asarray(a) for a in nupols_init_state(t, b, k, m))

    n_blocks = (m + 3) * k + 3  # several full windows past steady state
    for i in range(n_blocks):
        x = jnp.asarray(rng.standard_normal((t, b)).astype(np.float32))
        ys, fre_s, fim_s = partconv_block(x, prev_s, fre_s, fim_s,
                                          h_re, h_im)
        prev_s = x
        yn, state = block(x, state, hh_re, hh_im, ht_re, ht_im)
        ys, yn = np.asarray(ys), np.asarray(yn)
        np.testing.assert_allclose(
            yn, ys, atol=2e-5 * max(np.abs(ys).max(), 1e-9),
            err_msg=f"block {i}")


def test_nupols_runner_integration(small_cfg):
    """nupols through the registry/runner: the fold-algebra golden
    validates it unchanged across window boundaries."""
    from gpuaudiobench_tpu.harness.runner import run_benchmark
    from gpuaudiobench_tpu.registry import create_benchmark

    cfg = small_cfg.replace(
        n_tracks=2, buffer_size=32, ir_length=600, n_runs=10,
        partconv_form="nupols", partconv_tail_chunk=4,
        pipeline_depth=9)  # odd depth: stream crosses window phases
    bench = create_benchmark("PartConv", cfg)
    bench.setup()
    r = run_benchmark(bench, cfg, verbose=False)
    assert r.validation.passed, r.validation.messages
    assert r.metadata["formResolved"] == "nupols"
    assert r.metadata["nupolsTailPartitions"] == 4  # ceil(472/128)
    assert r.metadata["nupolsHeadPartitions"] == 4


def test_nupols_headonly_falls_back_to_shift():
    b = _bench(n_tracks=2, buffer_size=32, ir_length=128,
               partconv_form="nupols", partconv_tail_chunk=8)
    # head = 8*32 = 256 >= 128 taps: no tail, runs the shift form
    assert b.metadata()["formResolved"] == "shift"
    assert b.nupols_tail == 0
    for _ in range(3):
        b.iterate()
    v = b.validate()
    assert v.passed, v.messages


def test_nupols_config_validation():
    from gpuaudiobench_tpu.config import BenchConfig

    with pytest.raises(ValueError, match="partconv_tail_chunk"):
        BenchConfig(partconv_tail_chunk=1).validate()
    with pytest.raises(ValueError, match="partconv form"):
        BenchConfig(partconv_form="gardner").validate()


def test_nupols_phase_windows_cover_every_slot():
    """The spread-MAC phase windows [1 + g*L, 1 + (g+1)*L) must cover
    slots 1..M-1, with everything past M hitting zero-padded H."""
    from gpuaudiobench_tpu.ops.partconv import nupols_group_len

    for m in (1, 2, 5, 11, 16, 33, 58):
        for k in (2, 4, 8, 16):
            ell = nupols_group_len(m, k)
            got = []
            for g in range(k):
                got.extend(range(1 + g * ell, 1 + (g + 1) * ell))
            assert got[0] == 1 and len(got) == k * ell
            assert set(range(1, m)) <= set(got), (m, k)
            assert max(got) < 1 + k * ell  # inside the padded H


def test_nupols_data_parallel_matches_single_device():
    single = _bench(n_tracks=8, buffer_size=32, ir_length=600,
                    partconv_form="nupols", partconv_tail_chunk=4)
    for _ in range(6):
        single.iterate()
    sharded = _bench(n_tracks=8, buffer_size=32, ir_length=600,
                     partconv_form="nupols", partconv_tail_chunk=4,
                     data_parallel=8)
    for _ in range(6):
        sharded.iterate()
    np.testing.assert_allclose(
        single.host_output, sharded.host_output, rtol=0, atol=1e-6)
    assert sharded.validate().passed
