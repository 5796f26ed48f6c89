"""End-to-end CLI integration: the full process surface via subprocess
(hardware-free on the CPU backend)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=300):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO  # drop the machine's TPU-tunnel sitecustomize
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [sys.executable, "-m", "gpuaudiobench_tpu.cli", *args],
        capture_output=True, text=True, env=env, timeout=timeout, cwd=REPO,
    )


def test_list_exits_zero():
    r = _run(["--list"])
    assert r.returncode == 0
    assert "RndMemRead" in r.stdout
    assert "BiquadChain" in r.stdout


def test_help_shows_flags():
    r = _run(["--help"])
    assert r.returncode == 0
    for flag in ("--benchmark", "--benchmarkFilter", "--verification",
                 "--dawsim", "--category"):
        assert flag in r.stdout


def test_unknown_benchmark_fails():
    r = _run(["--benchmark", "NoSuchBenchmark"])
    assert r.returncode == 1
    assert "Unknown benchmark" in r.stdout


def test_gain_json_end_to_end(tmp_path):
    out = tmp_path / "r.json"
    r = _run([
        "--benchmark", "gain", "--nRuns", "3", "--warmup", "1",
        "--bufferSize", "64", "--nTracks", "8", "--json",
        "--no-device-timing", "--outputfile", str(out),
    ])
    assert r.returncode == 0, r.stdout[-500:] + r.stderr[-500:]
    payload = json.loads(out.read_text())
    assert payload["benchmark"] == "gain"
    assert payload["validation"]["status"] == "SUCCESS"
    assert payload["deadline"]["threshold_ms"] == pytest.approx(64000 / 48000)
    assert len(payload["raw_latencies_ms"]) == 3


def test_csv_and_report_pipeline(tmp_path):
    csv = tmp_path / "r.csv"
    r = _run([
        "--benchmarkFilter", "gain,GainStats", "--nRuns", "3", "--warmup", "1",
        "--bufferSize", "64", "--nTracks", "8", "--no-device-timing",
        "--outputfile", str(csv),
    ])
    assert r.returncode == 0
    lines = csv.read_text().strip().split("\n")
    assert len(lines) == 3  # header + 2 benchmarks
    # analysis/compare.py consumes the CSV
    r2 = subprocess.run(
        [sys.executable, os.path.join(REPO, "analysis", "compare.py"), str(csv)],
        capture_output=True, text=True, timeout=60,
    )
    assert r2.returncode == 0
    assert "GainStats" in r2.stdout
