#!/usr/bin/env bash
# Seventeenth on-chip batch (round 4, short): production-claim soak.
#   soak_session_wall — 120 s of continuous streaming at the CERTIFIED
#   DAWSessionMix wall size (212,992 strips, confirm_r4_session: sat
#   p99 9.21 ms, CV 0.9%): does the wall size HOLD under sustained
#   load with carried state, not just across 21 reps? The carry
#   (incl. the 436 MB input block) uploads once; per-second means are
#   the metric.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/chip_queue17
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

note "=== chip_queue17 run ==="
run_step soak_session_wall 5400 python tools/soak.py 120 \
  docs/RESULTS_r4_soak_session_wall.md DAWSessionMix 212992
commit_art "Soak at the wall: DAWSessionMix 212,992 strips for 120 s" \
  docs/RESULTS_r4_soak_session_wall.md
note "=== chip_queue17 done ==="
