#!/usr/bin/env bash
# Eleventh on-chip batch (round 3). Prereq: the rndmem_tune LICM fix
# -- chip_queue10's sweep numbers were one hoisted dispatch divided by
# DEPTH (112 TB/s "useful"), because the carry-fold did not consume
# the gather inputs; the tool now runs on the harness's own
# barrier_chain + measure_saturated tier.
#
#   1. rndmem_tune (fixed): does random-access efficiency rise past
#      the archived 87.8 GB/s with more reads outstanding
#      (tps x (n_slots-1) in flight)? Writes the md artifact directly.
#   2. If a non-default config wins by >5%, a confirmation run of the
#      RndMemRead benchmark is manual follow-up (flags documented in
#      ops/rndmem_pallas.py) -- the sweep only ranks kernels.
#
# Logs in /tmp/chip_queue11/.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/chip_queue11
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

note "=== chip_queue11 run ==="

if ! timeout 90 python -c "import jax; print(jax.devices())" >"$LOG/probe.log" 2>&1; then
  note "ABORT relay unhealthy (probe timed out/failed)"
  exit 2
fi
note "probe ok: $(cat "$LOG/probe.log")"

run_step rndmem_tune 5400 python tools/rndmem_tune.py \
  docs/RESULTS_r3_rndmem_tune.md
grep -hE "tps=" "$LOG/rndmem_tune.log" | tee -a "$LOG/summary.log" || true

# Finish the IIR capacity search chip_queue10 bracketed: with the 413
# wall removed, 786432 tracks sustained at 10.624 ms sat p99 (99.6% of
# the 10.667 deadline) and 1048576 missed at 12.231 -- the wall is a
# genuine deadline wall just past 786k. queue10's full-precision
# search was stopped (35+ min per probe, transfer-dominated at 3 GiB
# of I/O per probe; quantum-2048 precision is noise-chasing when the
# certified point already sits 0.4% under the deadline). This narrow
# search re-certifies with the partial-flush tool at quantum 16384
# (+-2% precision, <=3 probes) and archives a confirmed record.
run_step cap_iir 10800 python tools/capacity.py \
  --benchmark IIRFilter --verification none --maxEvals 6 \
  --nRuns 3 --warmup 2 --pipelineDepth 16 \
  --lo 786432 --hi 819200 --quantum 16384 --json "$LOG/cap_iir.json"

# Re-establish the chip_queue9 capacity results that died with /tmp:
# the RndMemRead genuine deadline wall (261120 tracks) survives only
# as a script comment, and the DAWSessionMix post-fix wall value was
# lost entirely. Search session past the archived 65536 ceiling and
# take fresh-process confirmation numbers at both walls so
# RESULTS_r3_capacity.md can carry measured rows, not comments.
run_step cap_session 14400 python tools/capacity.py \
  --benchmark DAWSessionMix --verification none --maxEvals 14 \
  --nRuns 3 --warmup 2 --pipelineDepth 16 \
  --lo 65536 --hi 1048576 --quantum 16384 --json "$LOG/cap_session.json"
run_step cap_rndmem 7200 python tools/capacity.py \
  --benchmark RndMemRead --verification none --maxEvals 6 \
  --nRuns 3 --warmup 2 --pipelineDepth 16 \
  --lo 212992 --hi 311296 --quantum 16384 --json "$LOG/cap_rndmem.json"
grep -hE "RESULT" "$LOG"/cap_*.log 2>/dev/null \
  | tee -a "$LOG/summary.log" || true

confirm() { # name benchmark
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
    --pipelineDepth 16 --verification spot \
    --outputfile "$LOG/confirm_$name.csv"
}
confirm iir IIRFilter
confirm session DAWSessionMix
confirm rndmem RndMemRead
grep -hE "===|Saturated|Device M|Validation" "$LOG"/confirm_*.log \
  2>/dev/null | tee -a "$LOG/summary.log" || true

# The flagship COMPOSITE through the no-Python PJRT path: one
# DAWSessionMix block (Pallas EQ cascade embedded as tpu_custom_call,
# send-summed stereo PartConv bus, mixdown) compiled and driven by
# native/pjrt_runner with no interpreter in the process -- the same
# flagship-parity pattern as modal/fdtd/partconv (PARITY.md).
run_step pjrt_export 600 python tools/export_stablehlo.py \
  --out "$LOG/shlo" session
run_step pjrt_session 1200 env \
  AXON_POOL_SVC_OVERRIDE=127.0.0.1 AXON_COMPAT_VERSION=49 \
  TPU_WORKER_HOSTNAMES=localhost \
  native/build/pjrt_runner --plugin /opt/axon/libaxon_pjrt.so \
  --program "$LOG/shlo/session.stablehlo.mlir" \
  --spec "$LOG/shlo/session.spec" \
  --compile-options "$LOG/shlo/compile_options.pb" --runs 10 \
  --opt topology=v5e:1x1x1 --opt n_slices=1 --opt remote_compile=1 \
  --opt session_id="$(cat /proc/sys/kernel/random/uuid)" \
  --opt rank=4294967295
grep -hE "compile|p50|checksum" "$LOG/pjrt_session.log" 2>/dev/null \
  | tee -a "$LOG/summary.log" || true

# Soak refreshes on the undiluted state-RMS metric: the archived
# PartConv and DAWSessionMix soaks averaged their constant carried
# spectra into state RMS (the metric now excludes un-evolved leaves),
# so their carry-integrity rows said little. Timing rows were fine.
run_step soak_partconv 1800 python tools/soak.py 120 \
  docs/RESULTS_r3_soak_partconv.md PartConv 1024
run_step soak_session 1800 python tools/soak.py 120 \
  docs/RESULTS_r3_soak_session.md DAWSessionMix 1024
grep -hE "state RMS|ms/block \(mean\)|deadline" \
  "$LOG"/soak_*.log 2>/dev/null | tee -a "$LOG/summary.log" || true

note "=== chip_queue11 done ==="
