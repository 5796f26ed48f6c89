"""Export benchmark device programs as StableHLO for native/pjrt_runner.

Writes <name>.stablehlo.mlir (the program, jax.export portable module)
and <name>.spec (one `dtype dim dim ...` line per input) so the
PJRT-C-API loader can compile and drive the exact program the Python
harness benchmarks -- with no interpreter in the benchmark process.

Usage:
  python tools/export_stablehlo.py [--out DIR] [name ...]
  # names: gain iirfilter modal conv1d (default: all)

Run under the TPU-registered interpreter (or any; the export pins
platforms=["tpu"]).
"""

from __future__ import annotations

import _pathfix  # noqa: F401,E402 - repo-root sys.path (tools/_pathfix.py)

import os
import sys

import numpy as np


def _session_pinned(core):
    """Close the session core over the benchmark's real (stable) EQ
    coefficients; every remaining input is safe to seed with noise
    (audio, states, FIR spectra, gains)."""
    import jax.numpy as jnp

    from gpuaudiobench_tpu.utils.data import biquad_lowpass_coefficients

    coeffs = jnp.asarray(np.array(
        [biquad_lowpass_coefficients(0.25 - 0.0125 * k) for k in range(4)],
        np.float32))

    def pinned(x, eq_states, send, pan2, prev, fre, fim, h_re, h_im):
        return core(x, coeffs, eq_states, send, pan2, prev, fre, fim,
                    h_re, h_im)

    return pinned


def _programs(cfg):
    import jax.numpy as jnp

    from gpuaudiobench_tpu.ops import fdtd3d as FC
    from gpuaudiobench_tpu.ops import modal_pallas as mp
    from gpuaudiobench_tpu.ops.conv import conv1d_direct
    from gpuaudiobench_tpu.ops.elementwise import gain_op
    from gpuaudiobench_tpu.ops.fdtd3d_pallas import fdtd3d_block_pallas_div
    from gpuaudiobench_tpu.ops.iir import iir_biquad_xla
    from gpuaudiobench_tpu.models.session import make_session_core
    from gpuaudiobench_tpu.ops.modal import modal_bank_xla
    from gpuaudiobench_tpu.ops.partconv import partconv_block

    t, s = cfg.n_tracks, cfg.buffer_size
    f32 = np.float32

    def shaped(*shape):
        import jax

        return jax.ShapeDtypeStruct(shape, f32)

    modes = 1024 * t
    # Flagship Pallas programs: the streaming-modal Mosaic kernel at the
    # headline 1M-mode/32-output shape and the FDTD divergence-form
    # kernel. Both serialize as stablehlo.custom_call(tpu_custom_call)
    # with the Mosaic payload embedded, so pjrt_runner executes the
    # EXACT kernels the Python harness benchmarks -- no interpreter.
    hmodes = 1024 * 1024  # the headline 1M-mode shape, not cfg.n_tracks
    mtile = mp.stream_tile(hmodes, 32)
    n = FC.GRID_N

    return {
        "modal_pallas": (
            lambda cw, sw, re, im: mp.modal_folded_step(
                cw, sw, re, im, s, 32, mtile
            ),
            [shaped(hmodes)] * 4,
        ),
        "fdtd3d_pallas": (
            lambda x, p, d: fdtd3d_block_pallas_div(x, p, d),
            [shaped(128, s), shaped(n, n, n), shaped(n, n, n)],
        ),
        "gain": (
            lambda x: gain_op(x, 2.0),
            [shaped(t, s)],
        ),
        "iirfilter": (
            lambda x, c, z: iir_biquad_xla(x, c, z),
            [shaped(t, s), shaped(5), shaped(t, 2)],
        ),
        "modal": (
            lambda amp, cw, sw, re, im: modal_bank_xla(
                amp, cw, sw, re, im, s, min(t, 32)
            ),
            [shaped(modes)] * 5,
        ),
        "conv1d": (
            lambda x, ir: conv1d_direct(x, ir, "clamp"),
            [shaped(t, s), shaped(t, 1024)],
        ),
        # PartConv streamed block at the default 1 s IR (94 partitions).
        # The SHIFT form is exported because its signature is all-f32
        # (the ring form carries an int32 head scalar, outside the
        # runner's f32-seeded spec format); both forms are the same
        # filter (tests/test_partconv.py::test_ring_equals_shift_form).
        "partconv": (
            partconv_block,
            [shaped(t, s), shaped(t, s),
             shaped(t, 94, s + 1), shaped(t, 94, s + 1),
             shaped(t, 94, s + 1), shaped(t, 94, s + 1)],
        ),
        # The flagship COMPOSITE: one DAWSessionMix block (per-strip
        # systolic EQ cascade -> send-summed stereo PartConv reverb
        # bus -> constant-power mixdown) as a single program, with the
        # Pallas cascade kernel embedded as tpu_custom_call. All-f32
        # signature (models/session.py make_session_core; 4 EQ stages,
        # 1 s IR = 94 partitions, stereo bus planes).
        #
        # The EQ coefficients are baked as COMPILE-TIME constants (the
        # benchmark's own staggered RBJ low-passes, stable by
        # construction) rather than a runtime input: pjrt_runner seeds
        # every spec input with uniform LCG noise, and noise in a
        # recursive filter's coefficient slots blows up within one
        # 512-sample block (measured on-chip: warmup checksum nan).
        # Coefficients are config, not streaming data -- 80 bytes,
        # nowhere near the 413 transport budget that forces
        # track-scaled operands into runtime arguments.
        "session": (
            _session_pinned(make_session_core("pallas", 4)),
            [shaped(t, s), shaped(4, t, 2),
             shaped(t), shaped(2, t), shaped(2, s),
             shaped(2, 94, s + 1), shaped(2, 94, s + 1),
             shaped(2, 94, s + 1), shaped(2, 94, s + 1)],
        ),
        "_jnp": jnp,  # keep the import alive
    }


def main(argv) -> int:
    out_dir = "."
    names = []
    it = iter(argv)
    for a in it:
        if a == "--out":
            out_dir = next(it)
        else:
            names.append(a)

    import jax

    from gpuaudiobench_tpu.config import BenchConfig

    cfg = BenchConfig()
    progs = _programs(cfg)
    progs.pop("_jnp")
    names = names or sorted(progs)

    os.makedirs(out_dir, exist_ok=True)
    # 1-replica/1-partition CompileOptionsProto for pjrt_runner
    # --compile-options (an empty proto means num_replicas=0, which
    # PJRT rejects).
    from jax._src.lib import xla_client

    co = xla_client.CompileOptions()
    co.num_replicas = 1
    co.num_partitions = 1
    with open(os.path.join(out_dir, "compile_options.pb"), "wb") as f:
        f.write(co.SerializeAsString())
    print(f"wrote {out_dir}/compile_options.pb")
    for name in names:
        fn, args = progs[name]
        exported = jax.export.export(jax.jit(fn), platforms=["tpu"])(*args)
        mlir = exported.mlir_module()
        prog_path = os.path.join(out_dir, f"{name}.stablehlo.mlir")
        spec_path = os.path.join(out_dir, f"{name}.spec")
        with open(prog_path, "w") as f:
            f.write(mlir)
        with open(spec_path, "w") as f:
            f.write(f"# inputs for {name} (pjrt_runner --spec)\n")
            for a in args:
                dims = " ".join(str(d) for d in a.shape)
                f.write(f"f32 {dims}\n".rstrip() + "\n")
        print(f"exported {name}: {prog_path} ({len(mlir)} bytes), {spec_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
