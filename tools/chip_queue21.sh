#!/bin/bash
# Round-5 measurement queue (VERDICT r4 directives 1-6).
#
# Discipline (chip_queue14+ pattern, docs/OPERATIONS.md):
#   - artifacts land in docs/ and are git-committed after EVERY step
#     (pathspec commit, retried on index.lock) -- /tmp is volatile;
#   - quiet-window probe gate before measurement phases;
#   - guaranteed-completion steps first; the slow capacity confirms
#     (IIR 917k setup is window-dependent, 20+ min) run LAST with
#     per-step timeouts; nothing is scheduled after them;
#   - each capacity confirm runs in its OWN python process (arena
#     fragmentation discipline).
#
# Usage: bash tools/chip_queue21.sh [phase-to-start-at]
set -u
cd "$(dirname "$0")/.."

commit() { # commit <msg> <paths...>
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

probe_gate() { # record the gate result; proceed either way but log it
  timeout 900 python tools/quiet_probe.py --cv 5 --tries 5 --sleep 45 \
    | tee -a docs/queue21_gates.log
}

START="${1:-1}"
echo "=== chip_queue21 starting at phase $START ==="

# ---- Phase 1: depth-sweep latency attribution (directive 1) --------
if [ "$START" -le 1 ]; then
  probe_gate
  timeout 2400 python tools/latency_attrib.py docs/RESULTS_r5_latency_attrib.md --reps 21
  commit "r5: depth-sweep latency attribution (rig floor vs chip per-block)" \
    docs/RESULTS_r5_latency_attrib.md docs/queue21_gates.log
fi

# ---- Phase 2: buffer-64 attribution + batched uploads (dir. 5) -----
if [ "$START" -le 2 ]; then
  timeout 3600 python tools/overlap64_attrib.py docs/RESULTS_r5_overlap64 --reps 5
  commit "r5: buffer-64 floor attribution + batched-upload attack" \
    docs/RESULTS_r5_overlap64.json docs/RESULTS_r5_overlap64.md
fi

# ---- Phase 3: tab5 100 MiB transfer tier (directive 3a) ------------
if [ "$START" -le 3 ]; then
  probe_gate
  timeout 3600 python tools/transfer_tab5.py --mib 100 --nRuns 11 --overlapDepth 16
  commit "r5: tab5 100 MiB transfer tier (+1 GiB attempt)" \
    docs/RESULTS_r5_tab5.json docs/RESULTS_r5_tab5.md docs/queue21_gates.log
fi

# ---- Phase 4: complete tab6 rndmem sweep (directive 3b) ------------
if [ "$START" -le 4 ]; then
  timeout 3600 python tools/rndmem_sweep.py docs/RESULTS_r5_rndmem --nRuns 3 --satReps 11
  commit "r5: complete tab6 rndmem sweep (all 6 published sizes, adaptive tps)" \
    docs/RESULTS_r5_rndmem.json docs/RESULTS_r5_rndmem.md
fi

# ---- Phase 5: suite regen with the marginal tier (directive 1) -----
if [ "$START" -le 5 ]; then
  probe_gate
  timeout 7200 bash tools/regen_artifacts.sh r5
  commit "r5: suite regen with marginal saturated tier" \
    docs/RESULTS_r5_tpu_v5e.json docs/RESULTS_r5_tpu_v5e.csv \
    docs/report_r5.html docs/queue21_gates.log
fi

# ---- Phase 6: re-measure unstable rows at n=101 (directive 2) ------
if [ "$START" -le 6 ]; then
  probe_gate
  timeout 5400 python tools/remeasure_rows.py docs/RESULTS_r5_tpu_v5e.json \
    NoOp DWG1DAccel IIRFilter RndMemRead datacopy5050 --satReps 101
  python tools/json_to_csv.py docs/RESULTS_r5_tpu_v5e.json docs/RESULTS_r5_tpu_v5e.csv
  if [ -f docs/RESULTS_r5.md ]; then
    python tools/render_results.py docs/RESULTS_r5.md
  fi
  python tools/report.py docs/RESULTS_r5_tpu_v5e.json -o docs/report_r5.html
  commit "r5: unstable suite rows re-measured at n=101 under probe gate" \
    docs/RESULTS_r5_tpu_v5e.json docs/RESULTS_r5_tpu_v5e.csv \
    docs/report_r5.html docs/queue21_gates.log docs/RESULTS_r5.md
fi

# ---- Phase 7: standing capacity rows, fresh confirms (dir. 6) ------
# Fast families first; one process per confirm.
if [ "$START" -le 7 ]; then
  probe_gate
  timeout 2400 python tools/capacity.py --benchmark NeuralAmp \
    --confirmOnly 256 --satReps 101 --pipelineDepth 16 \
    --verification spot --json docs/confirm_r5_neuralamp.json
  commit "r5: NeuralAmp 256 fresh confirm (n=101)" docs/confirm_r5_neuralamp.json
  timeout 2400 python tools/capacity.py --benchmark DWG1DNaive \
    --confirmOnly 32768 --satReps 101 --pipelineDepth 16 \
    --verification spot --json docs/confirm_r5_dwg.json
  commit "r5: DWG1DNaive 32768 fresh confirm (n=101)" docs/confirm_r5_dwg.json
  timeout 2400 python tools/capacity.py --benchmark PartConv \
    --confirmOnly 1536 --satReps 101 --pipelineDepth 16 \
    --verification spot --json docs/confirm_r5_partconv.json
  commit "r5: PartConv 1536 fresh confirm (n=101)" docs/confirm_r5_partconv.json
  timeout 2400 python tools/capacity.py --benchmark FDTD3D \
    --confirmOnly 80,82 --satReps 101 --pipelineDepth 16 \
    --verification spot --json docs/confirm_r5_fdtd.json
  commit "r5: FDTD3D room 80+82 fresh confirms (n=101)" docs/confirm_r5_fdtd.json
  timeout 3600 python tools/capacity.py --benchmark Conv1D \
    --confirmOnly 18432,19456 --satReps 101 --pipelineDepth 16 \
    --verification spot --json docs/confirm_r5_conv1d.json
  commit "r5: Conv1D 18432+19456 fresh confirms (n=101)" docs/confirm_r5_conv1d.json
  timeout 5400 python tools/capacity.py --benchmark ModalFilterBank \
    --confirmOnly 10485760,11010048 --satReps 101 --pipelineDepth 16 \
    --verification spot --json docs/confirm_r5_modal.json
  commit "r5: modal 10.49M+11.01M fresh confirms (n=101)" docs/confirm_r5_modal.json
fi

# ---- Phase 8: boundary certifications at n=101 (directive 4) -------
if [ "$START" -le 8 ]; then
  probe_gate
  timeout 5400 python tools/capacity.py --benchmark RndMemRead \
    --confirmOnly 229376,245760 --satReps 101 --pipelineDepth 16 \
    --verification spot --json docs/confirm_r5_rndmem.json
  commit "r5: RndMemRead 229376+245760 boundary confirms (n=101)" docs/confirm_r5_rndmem.json
  # The big one last: IIR at 786432 (certified candidate) AND 917504
  # (edge). Setup at these sizes is window-dependent (20+ min seen).
  timeout 10800 python tools/capacity.py --benchmark IIRFilter \
    --confirmOnly 786432,917504 --satReps 101 --pipelineDepth 16 \
    --verification spot --json docs/confirm_r5_iir.json
  commit "r5: IIR boundary confirms 786432+917504 (n=101)" docs/confirm_r5_iir.json
fi

# ---- Phase 9: ledger + mesh predictions + README regen -------------
if [ "$START" -le 9 ]; then
  python tools/build_capacity_ledger.py docs/cap_r5_iir.json \
    docs/cap_r4_iir.json docs/confirm_r5_iir.json || true
  python tools/build_capacity_ledger.py docs/cap_r5_rndmem.json \
    docs/cap_r4_rndmem.json docs/confirm_r5_rndmem.json || true
  for fam in conv1d modal neuralamp dwg partconv fdtd; do
    python tools/build_capacity_ledger.py docs/cap_r5_${fam}.json \
      - docs/confirm_r5_${fam}.json || true
  done
  python tools/merge_capacity.py docs/RESULTS_r5_capacity_tables.md \
    docs/cap_r5_iir.json docs/cap_r5_rndmem.json docs/cap_r5_conv1d.json \
    docs/cap_r5_modal.json docs/cap_r5_neuralamp.json docs/cap_r5_dwg.json \
    docs/cap_r5_partconv.json docs/cap_r5_fdtd.json \
    docs/cap_r4_session.json docs/cap_r4_modal64.json || true
  timeout 600 python tools/mesh_predict.py docs/RESULTS_r5_mesh.md || true
  python tools/readme_headline.py
  commit "r5: capacity ledger with brackets, mesh anchors refreshed, README regenerated" \
    docs/cap_r5_iir.json docs/cap_r5_rndmem.json \
    docs/RESULTS_r5_capacity_tables.md docs/RESULTS_r5_mesh.md README.md \
    docs/cap_r5_conv1d.json docs/cap_r5_modal.json docs/cap_r5_neuralamp.json \
    docs/cap_r5_dwg.json docs/cap_r5_partconv.json docs/cap_r5_fdtd.json
fi

echo "=== chip_queue21 complete ==="
