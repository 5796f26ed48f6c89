"""Mesh scaling curves for the multi-chip layer.

Runs MultiChipSuite and ICIBandwidth over a ladder of mesh shapes on
whatever devices are available (the 8-device virtual CPU mesh on this
rig -- functional/partitioning validation numbers, NOT ICI performance;
on a real pod the same command produces real scaling curves) and writes
a markdown table with the ANALYTIC v5e prediction next to each row
(parallel/ici_model.py): a CPU-mesh p50 answers "does it partition and
validate"; the predicted column answers "what should a real v5e pod
do", giving a future multi-chip run a concrete number to confirm or
refute (VERDICT r2 next #7).

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
    python tools/mesh_scaling.py [output.md]
"""

from __future__ import annotations

import _pathfix  # noqa: F401,E402 - repo-root sys.path (tools/_pathfix.py)

import sys

SUITE_MESHES = ["1,1,1", "2,1,1", "1,2,1", "1,1,2", "2,2,1", "2,2,2",
                "8,1,1", "1,8,1", "1,1,8"]
ICI_MESHES = ["1,1,1", "2,1,1", "2,2,1", "2,2,2"]


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "docs/RESULTS_r3_mesh.md"
    import jax

    from gpuaudiobench_tpu.config import BenchConfig
    from gpuaudiobench_tpu.harness.runner import run_benchmark
    from gpuaudiobench_tpu.registry import create_benchmark

    n_dev = len(jax.devices())
    platform = jax.devices()[0].platform
    lines = [
        "# Mesh scaling (multi-chip layer)",
        "",
        f"Platform: {platform}, {n_dev} device(s). On a virtual CPU mesh",
        "the p50 column is FUNCTIONAL (partitioning + collectives compile",
        "and validate); absolute times do not model ICI. The predicted",
        "column is the analytic v5e ICI collective cost",
        "(parallel/ici_model.py: ring algorithms at 45 GB/s/link/dir,",
        "1 us/hop, no compute overlap -- an upper bound on collective",
        "time a real pod run can test).",
        "",
        "| Benchmark | mesh dp,tp,sp | p50 ms | predicted v5e ICI ms | collectives | validation |",
        "|---|---|---:|---:|---|---|",
    ]
    for name, meshes in (("MultiChipSuite", SUITE_MESHES),
                         ("ICIBandwidth", ICI_MESHES)):
        for mesh in meshes:
            need = 1
            for p in mesh.split(","):
                need *= int(p)
            if need > n_dev:
                continue
            cfg = BenchConfig(
                buffer_size=256, n_tracks=32, n_runs=5, warmup=2,
                transfer_mib=1, mesh=mesh,
                write_latencies=False, device_timing=False,
            )
            b = create_benchmark(name, cfg)
            b.setup()
            r = run_benchmark(b, cfg, verbose=False)
            ok = "pass" if (r.validation is None or r.validation.passed) \
                else "FAIL"
            ici = (r.metadata or {}).get("ici_model")
            if ici:
                pred = f"{ici['predicted_total_ms']:.3f}"
                kinds = ", ".join(
                    f"{c['kind']}({c['bytes'] / 1024:.0f}KiB/n={c['axis_n']})"
                    for c in ici["collectives"]
                )
            else:
                pred, kinds = "0 (no ICI)", "—"
            lines.append(
                f"| {name} | {mesh} | {r.statistics.median:.2f} | "
                f"{pred} | {kinds} | {ok} |"
            )
            print(lines[-1])
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"written: {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
