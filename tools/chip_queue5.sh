#!/usr/bin/env bash
# Fifth on-chip batch (round 3): the FDTD room-capacity search enabled
# by --fdtdRoom, plus a non-default-room on-chip validation.
#
#   1. Largest room one chip simulates in real time: capacity on the
#      fdtd_room knob (verification none during the search -- the full
#      CPU-sim golden costs minutes per room size -- spot confirm at
#      the winner, which is what gets archived).
#   2. One explicit non-default room (80^3) measured with validation:
#      the configurable-grid kernels proven on real hardware, not just
#      in interpret mode.
#
# Logs in /tmp/chip_queue5/.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/chip_queue5
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

note "=== chip_queue5 run ==="

if ! timeout 90 python -c "import jax; print(jax.devices())" >"$LOG/probe.log" 2>&1; then
  note "ABORT relay unhealthy (probe timed out/failed)"
  exit 2
fi
note "probe ok: $(cat "$LOG/probe.log")"

run_step fdtd_room80 2400 python -m gpuaudiobench_tpu.cli \
  --benchmark FDTD3D --fdtdRoom 80 --nRuns 3 --warmup 2 \
  --pipelineDepth 16 --verification spot \
  --outputfile "$LOG/fdtd_room80.csv"
grep -hE "Saturated|Device M|Validation" "$LOG/fdtd_room80.log" \
  | tee -a "$LOG/summary.log" || true

run_step cap_fdtd 9000 python tools/capacity.py \
  --benchmark FDTD3D --maxEvals 10 \
  --verification none --confirmVerification spot \
  --json "$LOG/cap_fdtd.json"
grep -h "RESULT" "$LOG"/cap_*.log 2>/dev/null \
  | tee -a "$LOG/summary.log" || true

note "=== chip_queue5 done ==="
