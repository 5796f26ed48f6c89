#!/usr/bin/env bash
# Eighth on-chip batch (round 3): campaign re-runs whose workload
# lists grew DAWSessionMix this session --
#   1. low-latency buffer sweep  -> docs/RESULTS_r3_lowlatency.md
#   2. true-p99 (101-rep) pass   -> docs/RESULTS_r3_satreps.{md,json}
#   3. DAW-pacing campaign       -> docs/RESULTS_r3_dawsim.md
# Each tool regenerates its whole archived artifact from one run, so
# the older rows re-measure alongside the new ones (same-run
# consistency, the regen_artifacts discipline).
#
# Logs in /tmp/chip_queue8/.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/chip_queue8
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

note "=== chip_queue8 run ==="

if ! timeout 90 python -c "import jax; print(jax.devices())" >"$LOG/probe.log" 2>&1; then
  note "ABORT relay unhealthy (probe timed out/failed)"
  exit 2
fi
note "probe ok: $(cat "$LOG/probe.log")"

run_step lowlatency 7200 python tools/lowlatency_sweep.py \
  docs/RESULTS_r3_lowlatency.md
run_step satreps 7200 python tools/satreps_campaign.py 101 \
  docs/RESULTS_r3_satreps.md docs/RESULTS_r3_satreps.json
run_step dawsim 7200 python tools/dawsim_campaign.py \
  docs/RESULTS_r3_dawsim.md

note "=== chip_queue8 done ==="
