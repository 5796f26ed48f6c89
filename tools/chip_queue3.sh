#!/usr/bin/env bash
# Third on-chip batch (round 3): the consolidated remaining backlog.
# Batch 1 ran and its calibration/NeuralAmp results were committed, but
# the session host was recycled before batch 2 started, taking
# /tmp/chip_queue* (the PartConv A/B logs, capacity JSONs, soak CSVs)
# with it. This script re-measures everything not yet archived in
# docs/, in one logged pass:
#
#   1. Peak recalibration -> measured_peaks.json gains mxu_int8_flops
#      (SOL_MXU_int8 landed after the last calibration; doctor.py
#      currently reports "+spec:mxu_int8_flops").
#   2. Full-suite regen (tools/regen_artifacts.sh r3): the archived
#      RESULTS_r3 CSV/JSON/md/report predate SOL_VMEM, SOL_MXU_int8,
#      PartConv, NeuralAmp, NeuralAmpLSTM.
#   3. PartConv FDL-form x HDtype 2x2 A/B (batch 1 measured 3 cells;
#      logs lost) -> settles ring-vs-shift on TPU in BENCHMARKS.md.
#   4. NeuralAmp int8 A/B at C=128 (predicted no-win: bf16 already at
#      the HBM wall) and the compute-bound C=512 regime (predicted ~2x
#      over bf16), plus C=512 f32/bf16 baselines.
#   5. PartConv through the no-Python pjrt_runner (flagship-parity
#      exercise; batch 1's run never reached PARITY.md).
#   6. examples/ampsim.py on the chip (the one example never run there).
#   7. Low-latency sweep re-run (now includes PartConv + NeuralAmp
#      f32/bf16 + LSTM rows).
#   8. Soaks: PartConv default + 1024 tracks (the shape that hit the
#      HTTP 413 the stream-constants fix addressed), NeuralAmp at its
#      real-time 128-track default.
#   9. Capacity campaign (modal 512/64-buf, Conv1D, NeuralAmp, the
#      multi-benchmark table) + merged markdown for archiving.
#
# Same discipline as batches 1/2: per-step timeouts, logged, failures
# don't stop later steps. Logs in /tmp/chip_queue3/.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/chip_queue3
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

note "=== chip_queue3 run ==="

# 0a. Health probe: a wedged relay hangs interpreter startup; bound it.
if ! timeout 90 python -c "import jax; print(jax.devices())" >"$LOG/probe.log" 2>&1; then
  note "ABORT relay unhealthy (probe timed out/failed)"
  exit 2
fi
note "probe ok: $(cat "$LOG/probe.log")"

# 0b. Quiet-window check (OPERATIONS.md): gain CV > 10% => warn but
# continue; review the CV before archiving wall-clock-tier numbers.
run_step quietcheck 600 python -m gpuaudiobench_tpu.cli \
  --benchmark gain --nRuns 10 --warmup 3 --pipelineDepth 64 \
  --verification spot --outputfile "$LOG/quietcheck.csv"
grep -E "Run-to-run CV|Saturated|Device M" "$LOG/quietcheck.log" \
  | tee -a "$LOG/summary.log" || true

# 1. Recalibrate all peaks (adds mxu_int8_flops).
run_step calibrate 3600 python tools/calibrate_peaks.py
grep -E "GFLOP|GB/s|peak" "$LOG/calibrate.log" | tail -20 \
  | tee -a "$LOG/summary.log" || true

# 2. Full-suite artifact regen (nRuns 20, depth 256, all 29 benchmarks)
# -- writes docs/RESULTS_r3_tpu_v5e.{json,csv}, re-renders RESULTS_r3.md
# generated blocks, rebuilds the dashboard. Reviewed + gated with
# tools/compare_runs.py before committing.
run_step regen 10800 bash tools/regen_artifacts.sh r3

# 3. PartConv 2x2 A/B (form x H dtype).
for form in ring shift; do
  for hdt in f32 f16; do
    run_step partconv_${form}_${hdt} 1800 python -m gpuaudiobench_tpu.cli \
      --benchmark PartConv --partconvForm $form --partconvHDtype $hdt \
      --nRuns 5 --warmup 2 --pipelineDepth 256 --verification spot \
      --outputfile "$LOG/partconv_${form}_${hdt}.csv"
  done
done
grep -hE "Saturated|Device M" "$LOG"/partconv_*.log 2>/dev/null \
  | tee -a "$LOG/summary.log" || true

# 4. NeuralAmp int8 A/B (C=128) + compute-bound C=512 regime.
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
grep -hE "Saturated|Device M|of peak" "$LOG"/neuralamp_*.log 2>/dev/null \
  | tee -a "$LOG/summary.log" || true

# 5. PartConv through the no-Python PJRT path.
run_step pjrt_export 600 python tools/export_stablehlo.py \
  --out "$LOG/shlo" partconv
run_step pjrt_partconv 1200 env \
  AXON_POOL_SVC_OVERRIDE=127.0.0.1 AXON_COMPAT_VERSION=49 \
  TPU_WORKER_HOSTNAMES=localhost \
  native/build/pjrt_runner --plugin /opt/axon/libaxon_pjrt.so \
  --program "$LOG/shlo/partconv.stablehlo.mlir" \
  --spec "$LOG/shlo/partconv.spec" \
  --compile-options "$LOG/shlo/compile_options.pb" --runs 10 \
  --opt topology=v5e:1x1x1 --opt n_slices=1 --opt remote_compile=1 \
  --opt session_id="$(cat /proc/sys/kernel/random/uuid)" \
  --opt rank=4294967295

# 6. The amp-sim example end-to-end on the chip (short: relay RPC/block).
run_step ex_ampsim 1800 python examples/ampsim.py \
  --seconds 0.5 --out "$LOG/riff_amp.wav"

# 7. Low-latency sweep with the PartConv/NeuralAmp/LSTM rows.
run_step lowlatency 7200 python tools/lowlatency_sweep.py \
  "$LOG/RESULTS_lowlatency.md"

# 8. Soaks (120 s of audio each).
run_step soak_partconv 1800 python tools/soak.py 120 \
  "$LOG/soak_partconv.md" PartConv
run_step soak_partconv1024 2400 python tools/soak.py 120 \
  "$LOG/soak_partconv1024.md" PartConv 1024
run_step soak_neuralamp128 1800 python tools/soak.py 120 \
  "$LOG/soak_neuralamp128.md" NeuralAmp 128

# 9. Capacity campaign.
run_step cap_modal 5400 python tools/capacity.py \
  --benchmark ModalFilterBank --lo 1048576 --hi 33554432 \
  --maxEvals 10 --verification none --confirmVerification spot \
  --json "$LOG/cap_modal.json"
run_step cap_conv 5400 python tools/capacity.py \
  --benchmark Conv1D --lo 1024 --hi 65536 \
  --maxEvals 10 --json "$LOG/cap_conv.json"
run_step cap_neuralamp 5400 python tools/capacity.py \
  --benchmark NeuralAmp --lo 128 --hi 4096 \
  --maxEvals 10 --json "$LOG/cap_neuralamp.json"
run_step cap_table 9000 python tools/capacity.py \
  --benchmark IIRFilter --benchmark DWG1DNaive --benchmark RndMemRead \
  --benchmark PartConv \
  --maxEvals 10 --json "$LOG/cap_table.json" --md "$LOG/cap_table.md"
run_step cap_modal64 5400 python tools/capacity.py \
  --benchmark ModalFilterBank --bufferSize 64 --lo 65536 --hi 8388608 \
  --maxEvals 10 --verification none --confirmVerification spot \
  --json "$LOG/cap_modal64.json"
grep -h "RESULT" "$LOG"/cap_*.log 2>/dev/null \
  | tee -a "$LOG/summary.log" || true
run_step cap_merge 300 python tools/merge_capacity.py \
  "$LOG/RESULTS_capacity.md" "$LOG"/cap_*.json

note "=== chip_queue3 done ==="
