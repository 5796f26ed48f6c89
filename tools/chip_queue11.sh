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
