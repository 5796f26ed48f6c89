#!/usr/bin/env bash
# Second on-chip batch (round 3, continuation-5): measurements queued
# behind tools/chip_queue.sh's run -- the new code landed while it held
# the chip. Same discipline: per-step timeouts, logged, failures don't
# stop later steps. Logs in /tmp/chip_queue2/.
#
#   1. Peak recalibration -> measured_peaks.json gains mxu_int8_flops
#      (SOL_MXU_int8 landed after the first calibration).
#   2. PartConv form x HDtype A/B completion: the shift+f16 cell (ring
#      f32 / shift f32 / ring f16 measured in batch 1; shift won f32).
#   3. NeuralAmp int8 A/B: C=128 (predicted no-win: bf16 already at the
#      HBM wall) and the compute-bound C=512 regime (predicted ~2x over
#      bf16), plus C=512 f32/bf16 baselines to complete that table.
#   4. PartConv 120 s soak at 1024 tracks -- re-run of batch 1's FAIL
#      (HTTP 413), now proving the stream-constants-in-carry fix at the
#      shape that broke it.
#   5. NeuralAmp 120 s soak at its default 128 tracks (the real-time
#      operating point; batch 1 soaked 1024 tracks = 8x the shape).
#   6. Low-latency sweep re-run (now includes PartConv + NeuralAmp
#      f32/bf16 + LSTM rows).
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/chip_queue2
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

note "=== chip_queue2 run ==="

if ! timeout 90 python -c "import jax; print(jax.devices())" >"$LOG/probe.log" 2>&1; then
  note "ABORT relay unhealthy (probe timed out/failed)"
  exit 2
fi
note "probe ok"

# 1. Recalibrate all six peaks (adds mxu_int8_flops).
run_step calibrate 3600 python tools/calibrate_peaks.py
grep -E "GFLOP|GB/s" "$LOG/calibrate.log" | tee -a "$LOG/summary.log" || true

# 2. PartConv shift+f16 (completes the 2x2).
run_step partconv_shift_f16 1800 python -m gpuaudiobench_tpu.cli \
  --benchmark PartConv --partconvForm shift --partconvHDtype f16 \
  --nRuns 5 --warmup 2 --pipelineDepth 256 --verification spot \
  --outputfile "$LOG/partconv_shift_f16.csv"
grep -hE "Saturated|Device M" "$LOG/partconv_shift_f16.log" \
  | tee -a "$LOG/summary.log" || true

# 3. NeuralAmp int8 A/B.
run_step neuralamp_int8 1800 python -m gpuaudiobench_tpu.cli \
  --benchmark NeuralAmp --neuralampDtype int8 --nRuns 5 --warmup 2 \
  --pipelineDepth 64 --verification spot \
  --outputfile "$LOG/neuralamp_int8.csv"
for dt in f32 bf16 int8; do
  run_step neuralamp_c512_$dt 2400 python -m gpuaudiobench_tpu.cli \
    --benchmark NeuralAmp --neuralampChannels 512 --neuralampDtype $dt \
    --nRuns 5 --warmup 2 --pipelineDepth 16 --verification spot \
    --outputfile "$LOG/neuralamp_c512_$dt.csv"
done
grep -hE "Saturated|Device M|Roofline" "$LOG"/neuralamp_*.log \
  | tee -a "$LOG/summary.log" || true

# 4. PartConv soak at the shape that broke batch 1 (1024 tracks).
run_step soak_partconv 1800 python tools/soak.py 120 \
  "$LOG/soak_partconv.md" PartConv 1024

# 5. NeuralAmp soak at the default (real-time) 128-track shape.
run_step soak_neuralamp128 1800 python tools/soak.py 120 \
  "$LOG/soak_neuralamp128.md" NeuralAmp 128

# 6. Low-latency sweep with the new rows.
run_step lowlatency 7200 python tools/lowlatency_sweep.py \
  "$LOG/RESULTS_lowlatency.md"

note "=== chip_queue2 done ==="
