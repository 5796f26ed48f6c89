#!/usr/bin/env bash
# Fifth on-chip batch (round 3): the FDTD room-capacity search enabled
# by --fdtdRoom, plus a non-default-room on-chip validation.
#
#   1. Largest room one chip simulates in real time: capacity on the
#      fdtd_room knob (verification none during the search -- the full
#      CPU-sim golden costs minutes per room size -- spot confirm at
#      the winner, which is what gets archived).
#   2. One explicit non-default room (80^3) measured with validation:
#      the configurable-grid kernels proven on real hardware, not just
#      in interpret mode.
#
# Logs in /tmp/chip_queue5/.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/chip_queue5
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

note "=== chip_queue5 run ==="

if ! timeout 90 python -c "import jax; print(jax.devices())" >"$LOG/probe.log" 2>&1; then
  note "ABORT relay unhealthy (probe timed out/failed)"
  exit 2
fi
note "probe ok: $(cat "$LOG/probe.log")"

run_step fdtd_room80 2400 python -m gpuaudiobench_tpu.cli \
  --benchmark FDTD3D --fdtdRoom 80 --nRuns 3 --warmup 2 \
  --pipelineDepth 16 --verification spot \
  --outputfile "$LOG/fdtd_room80.csv"
grep -hE "Saturated|Device M|Validation" "$LOG/fdtd_room80.log" \
  | tee -a "$LOG/summary.log" || true

run_step cap_fdtd 9000 python tools/capacity.py \
  --benchmark FDTD3D --maxEvals 10 \
  --verification none --confirmVerification spot \
  --json "$LOG/cap_fdtd.json"

# 3. nupols v2 A/B (the cond-free redesign): the four regimes v1 was
# measured in -- default IR at 128/2048 tracks (v1: 0.461 / 8.87 sat
# vs shift 0.174 / 6.73), 10 s IR at 128 tracks K=8/K=16 (v1: 1.468 /
# 1.203 vs shift 4.137), and the 1024-track 10 s case v1 OOM'd at
# 16.3 GB (v2's single-buffered ring should fit at ~8 GB).
run_step nupols2_128 1800 python -m gpuaudiobench_tpu.cli \
  --benchmark PartConv --partconvForm nupols \
  --nRuns 5 --warmup 2 --pipelineDepth 256 --verification spot \
  --outputfile "$LOG/nupols2_128.csv"
run_step nupols2_2048 1800 python -m gpuaudiobench_tpu.cli \
  --benchmark PartConv --partconvForm nupols --nTracks 2048 \
  --nRuns 3 --warmup 2 --pipelineDepth 64 --verification spot \
  --outputfile "$LOG/nupols2_2048.csv"
run_step nupols2_longir_128 2400 python -m gpuaudiobench_tpu.cli \
  --benchmark PartConv --partconvForm nupols --irLength 480000 \
  --nRuns 3 --warmup 2 --pipelineDepth 64 --verification spot \
  --outputfile "$LOG/nupols2_longir_128.csv"
run_step nupols2_longir16_128 2400 python -m gpuaudiobench_tpu.cli \
  --benchmark PartConv --partconvForm nupols --partconvTailChunk 16 \
  --irLength 480000 \
  --nRuns 3 --warmup 2 --pipelineDepth 64 --verification spot \
  --outputfile "$LOG/nupols2_longir16_128.csv"
run_step nupols2_longir_1024 3600 python -m gpuaudiobench_tpu.cli \
  --benchmark PartConv --partconvForm nupols --partconvTailChunk 16 \
  --irLength 480000 --nTracks 1024 \
  --nRuns 3 --warmup 2 --pipelineDepth 16 --verification spot \
  --outputfile "$LOG/nupols2_longir_1024.csv"
grep -hE "Saturated|Device M|Validation" "$LOG"/nupols2_*.log \
  2>/dev/null | tee -a "$LOG/summary.log" || true

# 3c. IR-length capacity under v2.1 (the v2 search in chip_queue4 ran
# with the whole-G copy and topped out near the uniform form; the
# read-free ring should push well past it).
run_step cap_irlen_nupols2 7200 python tools/capacity.py \
  --benchmark PartConv --knob ir_length \
  --set partconv_form=nupols --set partconv_tail_chunk=16 \
  --lo 48000 --hi 5760000 --quantum 48000 --maxEvals 10 \
  --json "$LOG/cap_irlen_nupols2.json"

# 4. nupols v2 track capacity at the default IR + 120 s soak.
run_step cap_nupols2 7200 python tools/capacity.py \
  --benchmark PartConv --set partconv_form=nupols \
  --lo 512 --hi 8192 --quantum 512 --maxEvals 8 \
  --json "$LOG/cap_nupols2.json"
run_step soak_nupols1024 2400 python tools/soak.py 120 \
  "$LOG/soak_nupols1024.md" PartConv 1024 --set partconv_form=nupols

grep -h "RESULT" "$LOG"/cap_*.log 2>/dev/null \
  | tee -a "$LOG/summary.log" || true

note "=== chip_queue5 done ==="
