#!/usr/bin/env bash
# Thirteenth on-chip batch (round 3): chip_queue12 reordered after the
# first IIR probe showed this relay window runs a 786k-track probe
# slower than 25 minutes (1.5 GiB of input per probe; the process sat
# at 17.5 GB RSS marshalling the transfer when the step was cut).
# Guaranteed-completion items now run FIRST so a session cut cannot
# starve them; the heavyweight IIR re-certification is dropped -- the
# wall bracket stands on chip_queue10's measured numbers (786432
# sustains at 10.624 ms sat p99, 1048576 misses at 12.231; values
# recorded in tools/chip_queue11.sh when that queue was authored, raw
# logs lost to the /tmp wipe), with re-certification left on the queue
# for a fast relay window.
#
#   1. soak refreshes (PartConv, DAWSessionMix) on the undiluted
#      state-RMS metric -- write docs/ artifacts directly.
#   2. pjrt_session -- the DAWSessionMix composite through the
#      no-Python PJRT runner.
#   3. cap_session -- wall search past the 65536-strip ceiling
#      (probes start small and ascend geometrically; every probe
#      flushes to the .partial trace).
#   4. cap_rndmem -- bounded re-search around queue9's 261120 wall.
#
# Logs in /tmp/chip_queue13/.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/chip_queue13
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

note "=== chip_queue13 run ==="

if ! timeout 90 python -c "import jax; print(jax.devices())" >"$LOG/probe.log" 2>&1; then
  note "ABORT relay unhealthy (probe timed out/failed)"
  exit 2
fi
note "probe ok: $(tail -1 "$LOG/probe.log")"

# 1. Soak refreshes on the undiluted state-RMS metric.
run_step soak_partconv 1200 python tools/soak.py 120 \
  docs/RESULTS_r3_soak_partconv.md PartConv 1024
run_step soak_session 1200 python tools/soak.py 120 \
  docs/RESULTS_r3_soak_session.md DAWSessionMix 1024
grep -hE "state RMS|ms/block \(mean\)|deadline" \
  "$LOG"/soak_*.log 2>/dev/null | tee -a "$LOG/summary.log" || true

# 2. The flagship COMPOSITE through the no-Python PJRT path.
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

# 3. Session wall search past the 65536 ceiling (ascending probes;
# partial trace survives a cut).
run_step cap_session 3600 python tools/capacity.py \
  --benchmark DAWSessionMix --verification none --maxEvals 10 \
  --nRuns 3 --warmup 2 --pipelineDepth 16 \
  --lo 65536 --hi 1048576 --quantum 16384 --json "$LOG/cap_session.json"

# 4. RndMemRead wall re-search (bounded around queue9's 261120).
run_step cap_rndmem 3600 python tools/capacity.py \
  --benchmark RndMemRead --verification none --maxEvals 6 \
  --nRuns 3 --warmup 2 --pipelineDepth 16 \
  --lo 212992 --hi 311296 --quantum 16384 --json "$LOG/cap_rndmem.json"

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
  run_step "confirm_$name" 1800 python -m gpuaudiobench_tpu.cli \
    --benchmark "$bench" --nTracks "$capv" --nRuns 3 --warmup 2 \
    --pipelineDepth 16 --verification spot \
    --outputfile "$LOG/confirm_$name.csv"
}
confirm session DAWSessionMix
confirm rndmem RndMemRead
grep -hE "===|Saturated|Device M|Validation" "$LOG"/confirm_*.log \
  2>/dev/null | tee -a "$LOG/summary.log" || true

note "=== chip_queue13 done ==="
