#!/usr/bin/env bash
# Fourth on-chip batch (round 3): the NUPOLS measurement campaign and
# the post-default-flip artifact regen.
#
#   1. NUPOLS A/B vs the shift baseline measured earlier today
#      (shift: 0.174 ms sat @128 trk, 6.73 ms @2048):
#      default shape + 2048 tracks.
#   2. Long-IR regime (10 s IR = 480000 taps, 938 uniform partitions):
#      shift vs nupols K=8 vs nupols K=16 at 128 tracks, then the
#      traffic-wall case at 1024 tracks where uniform is predicted to
#      sit at/over the deadline (~17 ms at stream rate) and nupols
#      ~5x under it.
#   3. nupols real-time capacity search (the shift search ran in the
#      same session; compare the two records).
#   4. 120 s nupols soak at 1024 tracks (window-boundary spikes show
#      up as per-second max outliers if the lax.cond fires both
#      branches -- the soak is the honest detector).
#   5. Full-suite artifact regen (the committed RESULTS_r3 artifacts
#      predate the shift default flip), gated by tools/compare_runs.py
#      against the committed JSON before archiving.
#
# Same discipline as batches 1-3: per-step timeouts, logged, failures
# don't stop later steps. Logs in /tmp/chip_queue4/.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/chip_queue4
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

note "=== chip_queue4 run ==="

if ! timeout 90 python -c "import jax; print(jax.devices())" >"$LOG/probe.log" 2>&1; then
  note "ABORT relay unhealthy (probe timed out/failed)"
  exit 2
fi
note "probe ok: $(cat "$LOG/probe.log")"

run_step quietcheck 600 python -m gpuaudiobench_tpu.cli \
  --benchmark gain --nRuns 10 --warmup 3 --pipelineDepth 64 \
  --verification spot --outputfile "$LOG/quietcheck.csv"
grep -E "Run-to-run CV|Saturated|Device M" "$LOG/quietcheck.log" \
  | tee -a "$LOG/summary.log" || true

# 0c. Finish the shift-form track-capacity search: the full-range run
# measured 128..2048 sustaining (2048 = 6.39 ms) and 4096 missing
# (16.9 ms) but its 3072 bisection step outlived the session budget
# (the 4096-track depth-256 program took ~65 min in remote compile).
# Coarser quantum + cached 2048/4096 compiles finish it in one fresh
# compile.
run_step cap_shift_finish 7200 python tools/capacity.py \
  --benchmark PartConv --lo 2048 --hi 4096 --quantum 1024 \
  --maxEvals 4 --json "$LOG/cap_shift.json"

# 1. NUPOLS A/B at the two scales the shift baseline was measured.
run_step nupols_128 1800 python -m gpuaudiobench_tpu.cli \
  --benchmark PartConv --partconvForm nupols \
  --nRuns 5 --warmup 2 --pipelineDepth 256 --verification spot \
  --outputfile "$LOG/nupols_128.csv"
run_step nupols_2048 1800 python -m gpuaudiobench_tpu.cli \
  --benchmark PartConv --partconvForm nupols --nTracks 2048 \
  --nRuns 3 --warmup 2 --pipelineDepth 64 --verification spot \
  --outputfile "$LOG/nupols_2048.csv"
grep -hE "Saturated|Device M|Validation" "$LOG"/nupols_*.log 2>/dev/null \
  | tee -a "$LOG/summary.log" || true

# 2. Long-IR regime: 10 s reverb (480000 taps).
run_step longir_shift_128 2400 python -m gpuaudiobench_tpu.cli \
  --benchmark PartConv --irLength 480000 \
  --nRuns 3 --warmup 2 --pipelineDepth 64 --verification spot \
  --outputfile "$LOG/longir_shift_128.csv"
run_step longir_nupols_128 2400 python -m gpuaudiobench_tpu.cli \
  --benchmark PartConv --partconvForm nupols --irLength 480000 \
  --nRuns 3 --warmup 2 --pipelineDepth 64 --verification spot \
  --outputfile "$LOG/longir_nupols_128.csv"
run_step longir_nupols16_128 2400 python -m gpuaudiobench_tpu.cli \
  --benchmark PartConv --partconvForm nupols --partconvTailChunk 16 \
  --irLength 480000 \
  --nRuns 3 --warmup 2 --pipelineDepth 64 --verification spot \
  --outputfile "$LOG/longir_nupols16_128.csv"
run_step longir_shift_1024 3600 python -m gpuaudiobench_tpu.cli \
  --benchmark PartConv --irLength 480000 --nTracks 1024 \
  --nRuns 3 --warmup 2 --pipelineDepth 16 --verification spot \
  --outputfile "$LOG/longir_shift_1024.csv"
run_step longir_nupols_1024 3600 python -m gpuaudiobench_tpu.cli \
  --benchmark PartConv --partconvForm nupols --partconvTailChunk 16 \
  --irLength 480000 --nTracks 1024 \
  --nRuns 3 --warmup 2 --pipelineDepth 16 --verification spot \
  --outputfile "$LOG/longir_nupols_1024.csv"
grep -hE "Saturated|Device M|Validation" "$LOG"/longir_*.log 2>/dev/null \
  | tee -a "$LOG/summary.log" || true

# 3. nupols capacity search (default IR; compare with the shift search).
run_step cap_nupols 7200 python tools/capacity.py \
  --benchmark PartConv --set partconv_form=nupols \
  --lo 512 --hi 16384 --maxEvals 12 --json "$LOG/cap_nupols.json"

# 3b. Real-time IR-LENGTH capacity at the 128-track default: how long
# a reverb tail one chip sustains, uniform vs nupols (quantum = 1 s of
# IR). hi bounds chosen to stay inside HBM so an allocation failure
# cannot masquerade as a deadline miss (probe errors are recorded
# distinctly either way).
run_step cap_irlen_shift 7200 python tools/capacity.py \
  --benchmark PartConv --knob ir_length \
  --lo 48000 --hi 3840000 --quantum 48000 --maxEvals 10 \
  --json "$LOG/cap_irlen_shift.json"
run_step cap_irlen_nupols 7200 python tools/capacity.py \
  --benchmark PartConv --knob ir_length \
  --set partconv_form=nupols --set partconv_tail_chunk=16 \
  --lo 48000 --hi 5760000 --quantum 48000 --maxEvals 10 \
  --json "$LOG/cap_irlen_nupols.json"

# 4. 120 s nupols soak at 1024 tracks.
run_step soak_nupols1024 2400 python tools/soak.py 120 \
  "$LOG/soak_nupols1024.md" PartConv 1024 --set partconv_form=nupols

# 5. Full-suite regen on the post-flip defaults, then the A/B gate.
run_step regen 10800 bash tools/regen_artifacts.sh r3
run_step compare 600 python tools/compare_runs.py \
  /tmp/r3_committed.json docs/RESULTS_r3_tpu_v5e.json

grep -h "RESULT" "$LOG"/cap_*.log 2>/dev/null \
  | tee -a "$LOG/summary.log" || true
note "=== chip_queue4 done ==="
