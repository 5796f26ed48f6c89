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
