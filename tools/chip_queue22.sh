#!/bin/bash
# Round-5 follow-up queue: depth-matched confirms + window repairs.
#
# chip_queue21's phase-7 confirms ran at --pipelineDepth 16 (the r4
# search basis). That is correct for the r4-searched rows (IIR,
# RndMemRead) but charges the r3-searched standing rows ~1.4 ms MORE
# rig share than the depth-256 basis they were certified on
# (23.7 ms floor / 16 vs / 256): FDTD room 80 read 11.48 at depth 16
# where its chip cost is ~10.0 -- a methodology artifact, not a
# capacity change. This queue re-confirms the three near-edge r3
# families at their ORIGINAL depth-256 basis, repairs the one row the
# noisy phase-6 window left poor, resolves the r4 GainStats overlap
# anomaly, and rebuilds the ledger + README.
set -u
cd "$(dirname "$0")/.."

commit() {
  local msg="$1"; shift
  for i in 1 2 3 4 5; do
    git add -- "$@" 2>/dev/null
    if git commit -q -m "$msg" -- "$@" 2>/dev/null; then
      echo "committed: $msg"; return 0
    fi
    sleep $((i * 3))
  done
  echo "COMMIT FAILED: $msg" >&2
}

probe_gate() {
  timeout 1800 python tools/quiet_probe.py --cv 5 --tries 10 --sleep 60 \
    | tee -a docs/queue21_gates.log
}

START="${1:-1}"
echo "=== chip_queue22 starting at phase $START ==="

# ---- Phase 1: depth-256 confirms for the r3-basis families ---------
if [ "$START" -le 1 ]; then
  probe_gate
  timeout 5400 python tools/capacity.py --benchmark FDTD3D \
    --confirmOnly 80,82 --satReps 101 --pipelineDepth 256 \
    --verification spot --json docs/confirm_r5_fdtd256.json
  commit "r5: FDTD3D room 80+82 confirms at the r3 depth-256 basis (n=101)" \
    docs/confirm_r5_fdtd256.json docs/queue21_gates.log
  timeout 5400 python tools/capacity.py --benchmark Conv1D \
    --confirmOnly 18432,19456 --satReps 101 --pipelineDepth 256 \
    --verification spot --json docs/confirm_r5_conv1d256.json
  commit "r5: Conv1D 18432+19456 confirms at the r3 depth-256 basis (n=101)" \
    docs/confirm_r5_conv1d256.json
  timeout 7200 python tools/capacity.py --benchmark ModalFilterBank \
    --confirmOnly 10485760,11010048 --satReps 101 --pipelineDepth 256 \
    --verification spot --json docs/confirm_r5_modal256.json
  commit "r5: modal 10.49M+11.01M confirms at the r3 depth-256 basis (n=101)" \
    docs/confirm_r5_modal256.json
fi

# ---- Phase 2: datacopy5050 round-trip re-measure in a quiet window -
if [ "$START" -le 2 ]; then
  probe_gate
  timeout 1800 python tools/remeasure_rows.py docs/RESULTS_r5_tpu_v5e.json \
    datacopy5050 --satReps 101
  python tools/json_to_csv.py docs/RESULTS_r5_tpu_v5e.json docs/RESULTS_r5_tpu_v5e.csv
  python tools/render_results.py docs/RESULTS_r5.md
  python tools/report.py docs/RESULTS_r5_tpu_v5e.json -o docs/report_r5.html
  commit "r5: datacopy5050 re-measured in a verified-quiet window" \
    docs/RESULTS_r5_tpu_v5e.json docs/RESULTS_r5_tpu_v5e.csv \
    docs/RESULTS_r5.md docs/report_r5.html docs/queue21_gates.log
fi

# ---- Phase 3: GainStats overlap anomaly (VERDICT r4 weak #7) -------
if [ "$START" -le 3 ]; then
  timeout 1800 python - <<'EOF'
# Re-measure the r4 GainStats overlap serial twin at n=21 (the r4 run
# used 7 reps and read 42.9 ms/block vs ~30 for every neighbor).
import json
from gpuaudiobench_tpu.config import BenchConfig
from gpuaudiobench_tpu.harness.overlap import measure_overlap
from gpuaudiobench_tpu.harness.statistics import calculate_statistics
from gpuaudiobench_tpu.registry import create_benchmark

out = {}
for name in ("gain", "GainStats"):
    cfg = BenchConfig(n_runs=2, warmup=2, verification="spot",
                      device_timing=False, write_latencies=False,
                      quiet=True)
    b = create_benchmark(name, cfg)
    b.setup()
    step, blocks, carry = b.overlap_body()
    ser, ovl = measure_overlap(step, blocks, carry, depth=64, reps=21)
    out[name] = {
        "serial_p50_ms": calculate_statistics(ser).median,
        "overlapped_p50_ms": calculate_statistics(ovl).median,
        "serial_raw_ms": [round(v, 4) for v in ser],
        "reps": 21, "depth": 64,
    }
    print(name, out[name]["serial_p50_ms"], out[name]["overlapped_p50_ms"],
          flush=True)
with open("docs/RESULTS_r5_gainstats_overlap.json", "w") as f:
    json.dump(out, f, indent=2)
print("written: docs/RESULTS_r5_gainstats_overlap.json")
EOF
  commit "r5: GainStats overlap serial twin re-measured at n=21 (r4 weak #7)" \
    docs/RESULTS_r5_gainstats_overlap.json
fi

# ---- Phase 4: rebuild ledger with depth-matched confirms + README --
if [ "$START" -le 4 ]; then
  python tools/build_capacity_ledger.py docs/cap_r5_fdtd.json \
    - docs/confirm_r5_fdtd256.json || true
  python tools/build_capacity_ledger.py docs/cap_r5_conv1d.json \
    - docs/confirm_r5_conv1d256.json || true
  python tools/build_capacity_ledger.py docs/cap_r5_modal.json \
    - docs/confirm_r5_modal256.json || true
  python tools/merge_capacity.py docs/RESULTS_r5_capacity_tables.md \
    docs/cap_r5_iir.json docs/cap_r5_rndmem.json docs/cap_r5_conv1d.json \
    docs/cap_r5_modal.json docs/cap_r5_neuralamp.json docs/cap_r5_dwg.json \
    docs/cap_r5_partconv.json docs/cap_r5_fdtd.json \
    docs/cap_r4_session.json docs/cap_r4_modal64.json || true
  timeout 600 python tools/mesh_predict.py docs/RESULTS_r5_mesh.md || true
  python tools/readme_headline.py
  commit "r5: ledger rebuilt on depth-matched confirms; mesh + README regenerated" \
    docs/cap_r5_fdtd.json docs/cap_r5_conv1d.json docs/cap_r5_modal.json \
    docs/RESULTS_r5_capacity_tables.md docs/RESULTS_r5_mesh.md README.md
fi

# ---- Phase 5: bench sanity -----------------------------------------
if [ "$START" -le 5 ]; then
  timeout 3600 python bench.py | tail -1 | tee /tmp/bench_r5_sanity.json
  cp /tmp/bench_r5_sanity.json docs/bench_r5_sanity.json
  commit "r5: bench.py sanity record" docs/bench_r5_sanity.json
fi

echo "=== chip_queue22 complete ==="
