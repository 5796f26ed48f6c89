#!/usr/bin/env bash
# SUPERSEDED by tools/chip_queue13.sh (and chip_queue14.sh): this
# queue's ordering is known to starve — cap_iir's 1500 s timeout is
# below the measured 25-35 min per-probe cost of a 786k-track IIR
# probe in a slow relay window, so the first step predictably times
# out and eats the window's opening minutes (it did; see
# docs/ROUND3.md continuation-11). Kept for the record; do NOT re-run.
echo "chip_queue12 is SUPERSEDED by chip_queue13/14 (known-starving" \
     "ordering; see header). Refusing to run." >&2
exit 3
# Twelfth on-chip batch (round 3): re-run of chip_queue11's lost
# measurements -- the queue script landed (commit 981af61..d2e4b49)
# but the session restart wiped /tmp before any step produced an
# artifact. Same steps, re-prioritized and time-boxed so the items
# with the highest archival value complete first inside a short
# session:
#
#   1. cap_iir     -- certify the genuine IIR deadline wall past 786k
#                     tracks (queue10 bracket: 786432 sustains at
#                     10.624 sat p99, 1048576 misses at 12.231).
#   2. cap_rndmem  -- re-establish the RndMemRead wall (queue9 found
#                     261120; survives only as a script comment).
#   3. soak refreshes (PartConv, DAWSessionMix) on the undiluted
#                     state-RMS metric (constant carried spectra are
#                     now excluded from carry integrity).
#   4. pjrt_session -- the DAWSessionMix composite through the
#                     no-Python PJRT runner (flagship-parity pattern).
#   5. cap_session -- open-ended search past the 65536 ceiling (the
#                     longest, most open-ended step runs last; the
#                     .partial trace survives a timeout).
#
# Logs in /tmp/chip_queue12/.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/chip_queue12
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

note "=== chip_queue12 run ==="

if ! timeout 90 python -c "import jax; print(jax.devices())" >"$LOG/probe.log" 2>&1; then
  note "ABORT relay unhealthy (probe timed out/failed)"
  exit 2
fi
note "probe ok: $(tail -1 "$LOG/probe.log")"

# 1. IIR wall: narrow re-certify at quantum 16384 (queue10's bracket
# already pinned it to (786432, 1048576); <=3 probes at +-2%).
run_step cap_iir 1500 python tools/capacity.py \
  --benchmark IIRFilter --verification none --maxEvals 6 \
  --nRuns 3 --warmup 2 --pipelineDepth 16 \
  --lo 786432 --hi 819200 --quantum 16384 --json "$LOG/cap_iir.json"

# 2. RndMemRead wall: bounded re-search around queue9's 261120.
run_step cap_rndmem 1500 python tools/capacity.py \
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
  run_step "confirm_$name" 1200 python -m gpuaudiobench_tpu.cli \
    --benchmark "$bench" --nTracks "$capv" --nRuns 3 --warmup 2 \
    --pipelineDepth 16 --verification spot \
    --outputfile "$LOG/confirm_$name.csv"
}
confirm iir IIRFilter
confirm rndmem RndMemRead
grep -hE "===|Saturated|Device M|Validation" "$LOG"/confirm_*.log \
  2>/dev/null | tee -a "$LOG/summary.log" || true

# 3. Soak refreshes on the undiluted state-RMS metric (write the md
# artifacts directly; per-second CSVs land beside them).
run_step soak_partconv 1200 python tools/soak.py 120 \
  docs/RESULTS_r3_soak_partconv.md PartConv 1024
run_step soak_session 1200 python tools/soak.py 120 \
  docs/RESULTS_r3_soak_session.md DAWSessionMix 1024
grep -hE "state RMS|ms/block \(mean\)|deadline" \
  "$LOG"/soak_*.log 2>/dev/null | tee -a "$LOG/summary.log" || true

# 4. The flagship COMPOSITE through the no-Python PJRT path.
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

# 5. Session wall search past the 65536 ceiling (open-ended; last).
run_step cap_session 2400 python tools/capacity.py \
  --benchmark DAWSessionMix --verification none --maxEvals 10 \
  --nRuns 3 --warmup 2 --pipelineDepth 16 \
  --lo 65536 --hi 1048576 --quantum 16384 --json "$LOG/cap_session.json"
confirm session DAWSessionMix

note "=== chip_queue12 done ==="
