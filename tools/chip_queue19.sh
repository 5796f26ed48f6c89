#!/usr/bin/env bash
set -u
cd /root/repo
LOG=/tmp/chip_queue19; mkdir -p "$LOG"
note() { printf '%s %s\n' "$(date +%H:%M:%S)" "$*" | tee -a "$LOG/summary.log"; }
note "=== chip_queue19 (suite regen after adaptive-tps fix) ==="
if timeout 4500 bash tools/regen_artifacts.sh r4 >"$LOG/regen.log" 2>&1; then
  note "OK regen"
else
  note "FAIL regen (rc=$?)"
fi
for i in 1 2 3 4 5; do
  if git add -- docs/RESULTS_r4_tpu_v5e.json docs/RESULTS_r4_tpu_v5e.csv docs/RESULTS_r4.md docs/report_r4.html >>"$LOG/git.log" 2>&1 \
      && git commit -m "RESULTS_r4: suite regen after the adaptive-tps rndmem fix" -- docs/RESULTS_r4_tpu_v5e.json docs/RESULTS_r4_tpu_v5e.csv docs/RESULTS_r4.md docs/report_r4.html >>"$LOG/git.log" 2>&1; then
    note "COMMIT artifacts"; break
  fi
  sleep 7
done
python tools/compare_runs.py docs/RESULTS_r3_tpu_v5e.json docs/RESULTS_r4_tpu_v5e.json >"$LOG/compare.log" 2>&1 || true
tail -3 "$LOG/compare.log" | tee -a "$LOG/summary.log"
note "=== chip_queue19 done ==="
