"""Native PJRT-C-API loader: build, CLI surface, and the StableHLO
exporter. The on-TPU execution path is exercised manually (see
docs/PARITY.md); these tests cover everything that runs hardware-free."""

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
RUNNER = REPO / "native" / "build" / "pjrt_runner"


def _build_runner():
    if RUNNER.exists():
        return True
    r = subprocess.run(
        ["make", "pjrt_runner"], cwd=REPO / "native",
        capture_output=True, text=True,
    )
    return r.returncode == 0


@pytest.fixture(scope="module")
def runner():
    if not _build_runner():
        pytest.skip("pjrt_runner build unavailable (no pjrt_c_api.h?)")
    return str(RUNNER)


def test_runner_usage(runner):
    r = subprocess.run([runner], capture_output=True, text=True)
    assert r.returncode == 1
    assert "usage:" in r.stderr


def test_runner_rejects_bad_plugin(runner, tmp_path):
    prog = tmp_path / "p.mlir"
    prog.write_text("module {}")
    spec = tmp_path / "p.spec"
    spec.write_text("f32 4 4\n")
    r = subprocess.run(
        [runner, "--plugin", "/nonexistent.so", "--program", str(prog),
         "--spec", str(spec)],
        capture_output=True, text=True,
    )
    assert r.returncode == 1
    assert "dlopen failed" in r.stderr


def test_runner_rejects_bad_opt(runner):
    r = subprocess.run(
        [runner, "--opt", "noequalsign"], capture_output=True, text=True
    )
    assert r.returncode == 1
    assert "key=value" in r.stderr


def test_exporter_writes_program_and_spec(tmp_path):
    env = dict(os.environ, PYTHONPATH=str(REPO), JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, str(REPO / "tools" / "export_stablehlo.py"),
         "--out", str(tmp_path), "gain"],
        capture_output=True, text=True, env=env,
    )
    assert r.returncode == 0, r.stderr[-500:]
    mlir = (tmp_path / "gain.stablehlo.mlir").read_text()
    assert "stablehlo" in mlir or "func.func" in mlir
    assert "128x512xf32" in mlir  # default (nTracks, bufferSize)
    spec = (tmp_path / "gain.spec").read_text()
    assert "f32 128 512" in spec
    assert (tmp_path / "compile_options.pb").stat().st_size > 0


def test_exporter_serializes_pallas_flagships(tmp_path):
    """The streaming-modal and FDTD div-form Mosaic kernels export as
    stablehlo.custom_call(tpu_custom_call) portable modules, so
    pjrt_runner drives the EXACT kernels the harness benchmarks."""
    env = dict(os.environ, PYTHONPATH=str(REPO), JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, str(REPO / "tools" / "export_stablehlo.py"),
         "--out", str(tmp_path), "modal_pallas", "fdtd3d_pallas"],
        capture_output=True, text=True, env=env,
    )
    assert r.returncode == 0, r.stderr[-500:]
    modal = (tmp_path / "modal_pallas.stablehlo.mlir").read_text()
    assert "tpu_custom_call" in modal  # the Mosaic kernel, not a rewrite
    assert "1048576xf32" in modal  # headline 1M-mode shape
    assert "f32 1048576" in (tmp_path / "modal_pallas.spec").read_text()
    fdtd = (tmp_path / "fdtd3d_pallas.stablehlo.mlir").read_text()
    assert "tpu_custom_call" in fdtd
    assert "52x52x52xf32" in fdtd
    assert "f32 52 52 52" in (tmp_path / "fdtd3d_pallas.spec").read_text()


def test_exporter_serializes_partconv(tmp_path):
    """The PartConv streamed block (shift form: all-f32 signature)
    exports as a portable StableHLO module with the FFT + partition
    MAC inside."""
    env = dict(os.environ, PYTHONPATH=str(REPO), JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, str(REPO / "tools" / "export_stablehlo.py"),
         "--out", str(tmp_path), "partconv"],
        capture_output=True, text=True, env=env,
    )
    assert r.returncode == 0, r.stderr[-500:]
    mod = (tmp_path / "partconv.stablehlo.mlir").read_text()
    assert "fft" in mod.lower()  # the rfft/irfft pair survived
    assert "128x94x513xf32" in mod  # FDL planes at the 1 s default IR
    spec = (tmp_path / "partconv.spec").read_text()
    assert "f32 128 94 513" in spec


MOCK = REPO / "native" / "build" / "libpjrt_mock.so"


def _build_mock():
    if MOCK.exists():
        return True
    r = subprocess.run(
        ["make", "pjrt_mock"], cwd=REPO / "native",
        capture_output=True, text=True,
    )
    return r.returncode == 0


def _lcg_checksum(n=64, seed=42):
    """The runner's documented seeded LCG (pjrt_runner.cc NextRand),
    through the gain program (2x) over the first n output elements."""
    state = seed
    total = 0.0
    import numpy as np

    for _ in range(n):
        state = (state * 6364136223846793005 + 1442695040888963407) % 2**64
        v = np.float32(2.0 * ((state >> 33) & 0xFFFFFF) / 16777216.0 - 1.0)
        total += float(np.float32(2.0) * v)
    return total


def test_runner_executes_against_mock_plugin(runner, tmp_path):
    """Hardware-free end-to-end regression of the no-Python path
    (VERDICT r2 next #4): export the gain StableHLO, dlopen the
    loopback plugin, compile, upload seeded inputs, execute N timed
    runs, read back, and verify the printed checksum against the same
    LCG the runner seeds. Exercises every branch in pjrt_runner.cc.
    (jaxlib here bundles no CPU PJRT .so -- its CPU backend lives
    inside the Python extension -- hence the mock.)"""
    if not _build_mock():
        pytest.skip("pjrt_mock build unavailable (no pjrt_c_api.h?)")
    env = dict(os.environ, PYTHONPATH=str(REPO), JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, str(REPO / "tools" / "export_stablehlo.py"),
         "--out", str(tmp_path), "gain"],
        capture_output=True, text=True, env=env,
    )
    assert r.returncode == 0, r.stderr[-500:]
    r = subprocess.run(
        [runner, "--plugin", str(MOCK),
         "--program", str(tmp_path / "gain.stablehlo.mlir"),
         "--spec", str(tmp_path / "gain.spec"),
         "--compile-options", str(tmp_path / "compile_options.pb"),
         "--runs", "5",
         "--opt", "topology=mock:1x1x1", "--opt", "session_id=ci"],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr[-800:]
    out = r.stdout
    assert "PJRT C API v" in out
    assert "devices: 1 addressable" in out
    assert "inputs: 1 uploaded, outputs: 1" in out
    assert "runs: 5" in out
    import re

    m = re.search(r"checksum (-?\d+\.\d+)", out)
    assert m, out
    assert abs(float(m.group(1)) - _lcg_checksum()) < 1e-3


def test_mock_plugin_rejects_wrong_program(runner, tmp_path):
    """The mock must never fake semantics it does not implement: a
    program without a multiply is rejected at compile time."""
    if not _build_mock():
        pytest.skip("pjrt_mock build unavailable")
    prog = tmp_path / "p.mlir"
    prog.write_text("module { func.func @main() { return } }")
    spec = tmp_path / "p.spec"
    spec.write_text("f32 4 4\n")
    r = subprocess.run(
        [runner, "--plugin", str(MOCK), "--program", str(prog),
         "--spec", str(spec)],
        capture_output=True, text=True,
    )
    assert r.returncode == 1
    assert "only the multiply" in r.stderr


def test_exporter_serializes_session_composite(tmp_path):
    """The flagship composite (DAWSessionMix block: Pallas EQ cascade +
    send-summed stereo PartConv bus + mixdown) exports as ONE portable
    StableHLO module with the Mosaic cascade embedded, so pjrt_runner
    can drive the full mixing-session graph with no interpreter."""
    env = dict(os.environ, PYTHONPATH=str(REPO), JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, str(REPO / "tools" / "export_stablehlo.py"),
         "--out", str(tmp_path), "session"],
        capture_output=True, text=True, env=env,
    )
    assert r.returncode == 0, r.stderr[-500:]
    mod = (tmp_path / "session.stablehlo.mlir").read_text()
    assert "tpu_custom_call" in mod  # the Pallas cascade kernel
    assert "fft" in mod.lower()  # the reverb bus rfft/irfft pair
    spec = (tmp_path / "session.spec").read_text()
    assert "f32 128 512" in spec      # per-strip input block
    assert "f32 2 94 513" in spec     # stereo bus FDL planes (1 s IR)
    # 9 runtime inputs: the EQ coefficients are baked as compile-time
    # constants (the runner LCG-seeds every spec input, and noise in
    # recursive-coefficient slots goes nan within a block -- measured;
    # see tools/export_stablehlo.py).
    assert spec.count("f32") == 9
    assert "f32 4 5" not in spec      # no coefficient input to seed
