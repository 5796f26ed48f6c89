#!/usr/bin/env bash
# Twentieth on-chip batch (round 4, short): low-latency overlapped
# steady state — can a network-attached chip serve 1.33 ms buffers
# (buffer 64 @ 48 kHz) once the upload is pipelined? Subset of
# workloads, depth 64.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/chip_queue20
mkdir -p "$LOG"
note() { printf '%s %s\n' "$(date +%H:%M:%S)" "$*" | tee -a "$LOG/summary.log"; }
note "=== chip_queue20 run ==="
if timeout 2400 python tools/overlap_campaign.py \
    docs/RESULTS_r4_overlap64.md --bufferSize 64 --depth 64 --reps 5 \
    --benches gain,IIRFilter,datacopy5050,DAWSessionMix,Conv1D \
    >"$LOG/overlap64.log" 2>&1; then
  note "OK overlap64"
else
  note "FAIL overlap64 (rc=$?)"
fi
for i in 1 2 3 4 5; do
  if git add -- docs/RESULTS_r4_overlap64.md docs/RESULTS_r4_overlap64.json >>"$LOG/git.log" 2>&1 \
      && git commit -m "Low-latency overlap campaign: buffer-64 pipelined steady state" \
         -- docs/RESULTS_r4_overlap64.md docs/RESULTS_r4_overlap64.json >>"$LOG/git.log" 2>&1; then
    note "COMMIT artifacts"; break
  fi
  sleep 7
done
note "=== chip_queue20 done ==="
