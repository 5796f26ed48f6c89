#!/usr/bin/env bash
# Queued on-chip work for the next healthy relay window (round 3 backlog).
#
# Runs the measurements that were blocked when the relay wedged:
#   0. health probe + quiet-window check (gain CV; OPERATIONS.md protocol)
#   1. tools/calibrate_peaks.py rerun -> measured_peaks.json gains the
#      SOL_VMEM denominator (vmem_bytes_per_sec), closing the
#      "+spec:vmem_bytes_per_sec" fallback disclosed by peak_source
#   2. bench.py sanity (saturated_rep_p50_ms field on real hardware)
#   3. IIRFilter bufferSize-64 spot check (small-block unroll cap
#      non-regression; the S=512 archived path is unchanged by design)
#   4. examples on the real chip (Pallas path end-to-end)
#
# Every step is individually timed out and logged; a failure does not
# stop later steps. Logs land in /tmp/chip_queue/. Safe to re-run.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/chip_queue
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

note "=== chip_queue run ==="

# 0a. Health probe: a wedged relay hangs interpreter startup; bound it.
if ! timeout 90 python -c "import jax; print(jax.devices())" >"$LOG/probe.log" 2>&1; then
  note "ABORT relay still unhealthy (probe timed out/failed)"
  exit 2
fi
note "probe ok: $(cat "$LOG/probe.log")"

# 0b. Quiet-window check: archived numbers must come from a quiet relay
# hour (OPERATIONS.md). Gain CV > 10% => warn but continue (the VMEM
# calibration uses xplane device medians, which are drift-immune).
run_step quietcheck 600 python -m gpuaudiobench_tpu.cli \
  --benchmark gain --nRuns 10 --warmup 3 --pipelineDepth 64 \
  --verification spot --outputfile "$LOG/quietcheck.csv"
grep -E "Run-to-run CV|Saturated|Device M" "$LOG/quietcheck.log" \
  | tee -a "$LOG/summary.log" || true

# 1. Calibrate peaks including SOL_VMEM (writes utils/measured_peaks.json).
run_step calibrate 3600 python tools/calibrate_peaks.py
grep -E "vmem|peak|TFLOP|GB/s" "$LOG/calibrate.log" | tail -20 \
  | tee -a "$LOG/summary.log" || true

# 2. bench.py on-chip sanity (the driver-executed artifact).
run_step bench 2400 python bench.py

# 3. IIR small-block non-regression (unroll cap landed after last regen).
run_step iir64 900 python -m gpuaudiobench_tpu.cli \
  --benchmark IIRFilter --bufferSize 64 --nRuns 5 --warmup 2 \
  --pipelineDepth 64 --verification spot --outputfile "$LOG/iir64.csv"
run_step iir512 900 python -m gpuaudiobench_tpu.cli \
  --benchmark IIRFilter --nRuns 5 --warmup 2 \
  --pipelineDepth 64 --verification spot --outputfile "$LOG/iir512.csv"

# 4. Examples end-to-end on the chip (small durations: the relay pays
# an RPC per block, so seconds of audio are minutes of wall time).
run_step ex_bell 1800 python examples/streaming_synth.py \
  --seconds 0.5 --out /tmp/chip_queue/bell.wav
run_step ex_rir 1800 python examples/room_impulse.py \
  --seconds 0.25 --out /tmp/chip_queue/rir.wav
run_step ex_mesh 1800 python examples/multichip_synth.py \
  --seconds 0.25 --out /tmp/chip_queue/bell_mesh.wav
run_step ex_reverb 1800 python examples/reverb.py \
  --seconds 0.5 --rt60 0.5 --out /tmp/chip_queue/bell_hall.wav

# 4c. PartConv through the no-Python PJRT path (the flagship-parity
# exercise PARITY.md documents for gain/modal_pallas/fdtd3d_pallas).
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

# 4b. PartConv (new extension, never measured on-chip): archive a
# default-shape run (128 tracks x 1 s IR = 94 partitions) and A/B the
# FDL forms -- ring avoids the per-block FDL rewrite but pays a
# rotated gather of H; which wins on TPU is an open measured question
# (on the CPU backend, shift wins).
run_step partconv 1800 python -m gpuaudiobench_tpu.cli \
  --benchmark PartConv --nRuns 5 --warmup 2 --pipelineDepth 256 \
  --verification spot --outputfile "$LOG/partconv.csv"
run_step partconv_shift 1800 python -m gpuaudiobench_tpu.cli \
  --benchmark PartConv --partconvForm shift --nRuns 5 --warmup 2 \
  --pipelineDepth 256 --verification spot \
  --outputfile "$LOG/partconv_shift.csv"
run_step partconv_f16 1800 python -m gpuaudiobench_tpu.cli \
  --benchmark PartConv --partconvHDtype f16 --nRuns 5 --warmup 2 \
  --pipelineDepth 256 --verification spot \
  --outputfile "$LOG/partconv_f16.csv"
grep -hE "Saturated|Device M" "$LOG/partconv.log" \
  "$LOG/partconv_shift.log" "$LOG/partconv_f16.log" 2>/dev/null \
  | tee -a "$LOG/summary.log" || true

# 4d. PartConv 120 s soak (every carried-state benchmark has one;
# this checks the ring head wrap + FDL energy over ~11k blocks).
run_step soak_partconv 1800 python tools/soak.py 120 \
  "$LOG/soak_partconv.md" PartConv

# 4e. NeuralAmp (the MXU workload, never measured on-chip): f32 vs
# bf16 A/B -- docs/BENCHMARKS.md predicts f32 compute-bound ~2.1 ms
# (30.9 TFLOP/s delivered f32) and the bf16-resident mode
# bandwidth-bound ~0.8 ms (~0.5 GB/block at 660 GB/s); this decides it.
run_step neuralamp 1800 python -m gpuaudiobench_tpu.cli \
  --benchmark NeuralAmp --nRuns 5 --warmup 2 --pipelineDepth 64 \
  --verification spot --outputfile "$LOG/neuralamp.csv"
run_step neuralamp_bf16 1800 python -m gpuaudiobench_tpu.cli \
  --benchmark NeuralAmp --neuralampDtype bf16 --nRuns 5 --warmup 2 \
  --pipelineDepth 64 --verification spot \
  --outputfile "$LOG/neuralamp_bf16.csv"
grep -hE "Saturated|Device M" "$LOG/neuralamp.log" \
  "$LOG/neuralamp_bf16.log" 2>/dev/null | tee -a "$LOG/summary.log" || true
# NeuralAmp 120 s soak: receptive-field tails carried over ~11k blocks.
run_step soak_neuralamp 1800 python tools/soak.py 120 \
  "$LOG/soak_neuralamp.md" NeuralAmp
# LSTM arch: the sequential-recurrence counterpart (per-sample scan);
# its ms/block is the chip's small-GEMM dispatch floor.
run_step neuralamp_lstm 1800 python -m gpuaudiobench_tpu.cli \
  --benchmark NeuralAmpLSTM --nRuns 5 --warmup 2 --pipelineDepth 64 \
  --verification spot --outputfile "$LOG/neuralamp_lstm.csv"
grep -hE "Saturated|Device M" "$LOG/neuralamp_lstm.log" 2>/dev/null \
  | tee -a "$LOG/summary.log" || true

# 5. Capacity headlines (tools/capacity.py): the largest modal bank and
# Conv1D track count that sustain real time on this chip. lo starts at
# sizes the archived results already prove sustain (modal 1M = ~1.04 ms
# vs 10.67 ms deadline), so the probe budget is spent near the boundary.
run_step cap_modal 5400 python tools/capacity.py \
  --benchmark ModalFilterBank --lo 1048576 --hi 33554432 \
  --maxEvals 10 --verification none --confirmVerification spot \
  --json "$LOG/cap_modal.json"
run_step cap_conv 5400 python tools/capacity.py \
  --benchmark Conv1D --lo 1024 --hi 65536 \
  --maxEvals 10 --json "$LOG/cap_conv.json"
# NeuralAmp track capacity (predicted ~650 tracks f32-compute-bound).
run_step cap_neuralamp 5400 python tools/capacity.py \
  --benchmark NeuralAmp --lo 128 --hi 4096 \
  --maxEvals 10 --json "$LOG/cap_neuralamp.json"
# 6. The capacity table across the remaining knobbed benchmarks
# (per-benchmark default ranges; archived as docs/RESULTS_r3_capacity.md
# after review together with the modal/conv rows above).
run_step cap_table 9000 python tools/capacity.py \
  --benchmark IIRFilter --benchmark DWG1DNaive --benchmark RndMemRead \
  --benchmark PartConv \
  --maxEvals 10 --json "$LOG/cap_table.json" --md "$LOG/cap_table.md"
# Low-latency headline: largest modal bank at a 64-sample buffer
# (1.333 ms deadline) -- the interactive-latency operating point the
# low-latency sweep archives (docs/RESULTS_r3_lowlatency.md).
run_step cap_modal64 5400 python tools/capacity.py \
  --benchmark ModalFilterBank --bufferSize 64 --lo 65536 --hi 8388608 \
  --maxEvals 10 --verification none --confirmVerification spot \
  --json "$LOG/cap_modal64.json"
grep -h "RESULT" "$LOG"/cap_*.log 2>/dev/null \
  | tee -a "$LOG/summary.log" || true

# 6b. Merge every capacity record into one review-ready document
# (archive to docs/RESULTS_r3_capacity.md after a quiet-window check).
run_step cap_merge 300 python tools/merge_capacity.py \
  "$LOG/RESULTS_capacity.md" "$LOG"/cap_*.json

note "=== chip_queue done ==="
