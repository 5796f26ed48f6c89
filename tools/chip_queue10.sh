#!/usr/bin/env bash
# Tenth on-chip batch (round 3). Prereq: the stream-body input-capture
# fix (x rides the carry) -- chip_queue9's capacity searches hit
# HTTP 413 at 131072 tracks because stateful stream bodies serialized
# the (T, S) input block into the remote compile request.
#
#   1. rndmem_tune: DMA-pipeline sweep (tracks_per_step x n_slots) at
#      16384 tracks -- does random-access efficiency rise past
#      87.8 GB/s with more reads outstanding?
#   2. NeuralAmpLSTM saturated spot-check: the x-to-carry fix must not
#      re-trigger the params-in-carry regression class (archived
#      0.576 ms/block; params stay closure constants, only x moved).
#   3. Capacity re-search with the fix: IIRFilter (scan) past the old
#      413 wall (hi = 2M tracks). RndMemRead (261120, deadline) and
#      DAWSessionMix (search ran post-fix in chip_queue9) already
#      found genuine walls and are not re-searched.
#   4. Fresh-process confirms at the found capacities.
#   5. Full suite regen gated by compare_runs (the satreps-wide
#      regression detector for the stream-carry change).
#
# Logs in /tmp/chip_queue10/.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/chip_queue10
mkdir -p "$LOG"
note() { printf '%s %s\n' "$(date +%H:%M:%S)" "$*" | tee -a "$LOG/summary.log"; }

run_step() { # name timeout_s cmd...
  local name=$1 tmo=$2; shift 2
  note "START $name"
  if timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1; then
    note "OK    $name"
  else
    note "FAIL  $name (rc=$?, see $LOG/$name.log)"
  fi
}

note "=== chip_queue10 run ==="

if ! timeout 90 python -c "import jax; print(jax.devices())" >"$LOG/probe.log" 2>&1; then
  note "ABORT relay unhealthy (probe timed out/failed)"
  exit 2
fi
note "probe ok: $(cat "$LOG/probe.log")"

# ---- 1. rndmem DMA-pipeline tuning sweep ----------------------------
run_step rndmem_tune 3600 python tools/rndmem_tune.py "$LOG/rndmem_tune.md"
grep -hE "tps=" "$LOG/rndmem_tune.log" | tee -a "$LOG/summary.log" || true

# ---- 2. LSTM saturated spot-check (x-to-carry fix) -------------------
run_step lstm_check 1800 python -m gpuaudiobench_tpu.cli \
  --benchmark NeuralAmpLSTM --nRuns 5 --warmup 2 --pipelineDepth 256 \
  --outputfile "$LOG/lstm_check.csv"
grep -hE "Saturated \(|Device M|Validation" "$LOG/lstm_check.log" \
  | tee -a "$LOG/summary.log" || true

# ---- 3. capacity re-searches past the 413 wall -----------------------
cap() { # name json extra-args...
  local name=$1; shift
  run_step "cap_$name" 14400 python tools/capacity.py \
    --verification none --maxEvals 14 --nRuns 3 --warmup 2 \
    --pipelineDepth 16 --json "$LOG/cap_$name.json" "$@"
}
cap iir_scan --benchmark IIRFilter --lo 131072 --hi 2097152 --quantum 2048

# ---- 4. fresh-process confirmation at each found capacity -----------
confirm() { # name benchmark extra-flags...
  local name=$1 bench=$2; shift 2
  local capv
  capv=$(python - "$LOG/cap_$name.json" <<'EOF'
import json, sys
try:
    print(json.load(open(sys.argv[1]))["capacity"] or "")
except Exception:
    print("")
EOF
)
  if [ -z "$capv" ]; then
    note "SKIP  confirm_$name (no capacity in cap_$name.json)"
    return
  fi
  note "confirm_$name at $capv"
  run_step "confirm_$name" 3600 python -m gpuaudiobench_tpu.cli \
    --benchmark "$bench" --nTracks "$capv" --nRuns 3 --warmup 2 \
    --pipelineDepth 16 --verification spot "$@" \
    --outputfile "$LOG/confirm_$name.csv"
}
confirm iir_scan IIRFilter
grep -hE "===|Saturated|Device M|Validation" "$LOG"/confirm_*.log \
  2>/dev/null | tee -a "$LOG/summary.log" || true

# ---- 5. gated full-suite regen (stream-carry change detector) --------
git show HEAD:docs/RESULTS_r3_tpu_v5e.json > /tmp/r3_committed.json
run_step regen 14400 bash tools/regen_artifacts.sh r3
run_step compare 600 python tools/compare_runs.py \
  /tmp/r3_committed.json docs/RESULTS_r3_tpu_v5e.json

note "=== chip_queue10 done ==="
