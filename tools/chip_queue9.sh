#!/usr/bin/env bash
# Ninth on-chip batch (round 3):
#   1. IIR recurrence-form A/B -- scan kernel vs the new blockstate
#      Pallas MXU chunk kernel (ops/iir.py iir_biquad_blockstate_pallas)
#      at four regimes: default (256 trk, buf 512), buf 64, 16k trk,
#      65k trk. Decides whether --iirForm blockstate earns the default.
#   2. Raised-ceiling capacity re-searches: IIRFilter (both forms),
#      RndMemRead, DAWSessionMix all sat at the old 65536 search
#      ceiling with 4-15x deadline margin -- the archived numbers are
#      ceilings, not walls. hi = 1M tracks (IIR in+out = 4 GB on a
#      16 GB part; probes that RESOURCE_EXHAUST count as infeasible,
#      so check probe details for memory-vs-deadline attribution).
#      Searches run --verification none (host goldens are linear in
#      size); confirmation happens in a FRESH process afterwards (the
#      chip_queue7 post-search-arena lesson), validation spot.
#
# Logs in /tmp/chip_queue9/.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/chip_queue9
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

note "=== chip_queue9 run ==="

if ! timeout 90 python -c "import jax; print(jax.devices())" >"$LOG/probe.log" 2>&1; then
  note "ABORT relay unhealthy (probe timed out/failed)"
  exit 2
fi
note "probe ok: $(cat "$LOG/probe.log")"

# ---- 1. IIR form A/B ------------------------------------------------
iir_ab() { # name extra-flags...
  local name=$1; shift
  run_step "iir_${name}_scan" 1800 python -m gpuaudiobench_tpu.cli \
    --benchmark IIRFilter --iirForm scan "$@" \
    --outputfile "$LOG/iir_${name}_scan.csv"
  run_step "iir_${name}_bs" 1800 python -m gpuaudiobench_tpu.cli \
    --benchmark IIRFilter --iirForm blockstate "$@" \
    --outputfile "$LOG/iir_${name}_bs.csv"
}
iir_ab default --nRuns 10 --warmup 3
iir_ab buf64 --bufferSize 64 --nRuns 10 --warmup 3
iir_ab 16k --nTracks 16384 --nRuns 5 --warmup 2 --pipelineDepth 64
iir_ab 65k --nTracks 65536 --nRuns 3 --warmup 2 --pipelineDepth 32 \
  --verification spot
grep -hE "===|Saturated|Device M|Validation" "$LOG"/iir_*.log \
  2>/dev/null | tee -a "$LOG/summary.log" || true

# ---- 2. capacity re-searches past the old 65536 ceiling -------------
cap() { # name json extra-args...
  local name=$1; shift
  run_step "cap_$name" 10800 python tools/capacity.py \
    --verification none --maxEvals 12 --nRuns 3 --warmup 2 \
    --pipelineDepth 32 --json "$LOG/cap_$name.json" "$@"
}
cap iir_scan --benchmark IIRFilter --lo 65536 --hi 1048576 --quantum 1024
cap iir_bs --benchmark IIRFilter --lo 65536 --hi 1048576 --quantum 1024 \
  --set iir_form=blockstate
cap rndmem --benchmark RndMemRead --lo 65536 --hi 1048576 --quantum 1024
cap session --benchmark DAWSessionMix --lo 65536 --hi 1048576 --quantum 1024

# ---- 3. fresh-process confirmation at each found capacity -----------
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
    --pipelineDepth 32 --verification spot "$@" \
    --outputfile "$LOG/confirm_$name.csv"
}
confirm iir_scan IIRFilter
confirm iir_bs IIRFilter --iirForm blockstate
confirm rndmem RndMemRead
confirm session DAWSessionMix
grep -hE "===|Saturated|Device M|Validation" "$LOG"/confirm_*.log \
  2>/dev/null | tee -a "$LOG/summary.log" || true

note "=== chip_queue9 done ==="
