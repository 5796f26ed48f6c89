#!/usr/bin/env bash
# Eighteenth on-chip batch (round 4, short): sustained-load soaks at
# the certified capacity points.
#   1. soak_iir_wall — 120 s at the comfortably-certified IIR point
#      (786,432 biquad tracks; re-measured sat p99 9.57 this round).
#      One ~1.5 GiB carry upload, then per-second streaming.
#   2. soak_session_wall10 — the session wall soak extended to 600 s
#      (10 minutes at 212,992 strips).
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/chip_queue18
mkdir -p "$LOG"
note() { printf '%s %s\n' "$(date +%H:%M:%S)" "$*" | tee -a "$LOG/summary.log"; }
run_step() {
  local name=$1 tmo=$2; shift 2
  note "START $name"
  if timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1; then
    note "OK    $name"
  else
    note "FAIL  $name (rc=$?, see $LOG/$name.log)"
  fi
}
commit_art() {
  local msg=$1; shift
  local i
  for i in 1 2 3 4 5; do
    if git add -- "$@" >>"$LOG/git.log" 2>&1 \
        && git commit -m "$msg" -- "$@" >>"$LOG/git.log" 2>&1; then
      note "COMMIT $*"; return 0
    fi
    sleep 7
  done
  note "COMMIT-FAIL $*"
}

note "=== chip_queue18 run ==="
run_step soak_iir_wall 5400 python tools/soak.py 120 \
  docs/RESULTS_r4_soak_iir_wall.md IIRFilter 786432
commit_art "Soak at the certified IIR point: 786,432 tracks for 120 s" \
  docs/RESULTS_r4_soak_iir_wall.md
run_step soak_session_wall10 5400 python tools/soak.py 600 \
  docs/RESULTS_r4_soak_session_wall10.md DAWSessionMix 212992
commit_art "Session wall soak extended to 600 s (212,992 strips)" \
  docs/RESULTS_r4_soak_session_wall10.md
note "=== chip_queue18 done ==="
