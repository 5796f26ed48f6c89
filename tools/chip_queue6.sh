#!/usr/bin/env bash
# Sixth on-chip batch (round 3): FDTD re-measurement after the
# grid-scaled VMEM budget fix (ops/fdtd3d_pallas.py _vmem_limit_bytes).
# chip_queue5's room-80 run failed at Mosaic's default 16 MiB scoped
# VMEM (19.9 MiB working set) and its capacity search therefore
# reported the COMPILE wall (room 74) as the capacity; both re-run
# under the raised budget so the archived number is the deadline wall.
#
# Logs in /tmp/chip_queue6/.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/chip_queue6
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

note "=== chip_queue6 run ==="

if ! timeout 90 python -c "import jax; print(jax.devices())" >"$LOG/probe.log" 2>&1; then
  note "ABORT relay unhealthy (probe timed out/failed)"
  exit 2
fi
note "probe ok: $(cat "$LOG/probe.log")"

# 1. The room that failed to compile, validated on hardware.
run_step fdtd_room80 2400 python -m gpuaudiobench_tpu.cli \
  --benchmark FDTD3D --fdtdRoom 80 --nRuns 3 --warmup 2 \
  --pipelineDepth 16 --verification spot \
  --outputfile "$LOG/fdtd_room80.csv"
grep -hE "Saturated|Device M|Validation" "$LOG/fdtd_room80.log" \
  | tee -a "$LOG/summary.log" || true

# 2. Room capacity re-search past the old compile wall. lo=64 is a
# known sustain (chip_queue5: 5.3 ms); the deadline wall extrapolates
# to ~room 80-82 at n^3 scaling from the 7.8 ms room-74 probe.
run_step cap_fdtd 9000 python tools/capacity.py \
  --benchmark FDTD3D --lo 64 --hi 112 --maxEvals 10 \
  --verification none --confirmVerification spot \
  --json "$LOG/cap_fdtd.json"
grep -h "RESULT" "$LOG"/cap_*.log 2>/dev/null \
  | tee -a "$LOG/summary.log" || true

# 3. Fresh-process confirmation of the nupols IR-length capacity:
# chip_queue5's search measured ir_length=1536000 sustaining (sat p99
# 0.896 ms) but its in-process confirmation RESOURCE_EXHAUSTED after
# four failed over-capacity probes fragmented the arena. Validate the
# winner from a clean process; if it genuinely does not fit with
# validation on, step down one IR quantum-chunk at a time.
for irlen in 1536000 1488000 1344000; do
  if timeout 2400 python -m gpuaudiobench_tpu.cli \
      --benchmark PartConv --partconvForm nupols --partconvTailChunk 16 \
      --irLength "$irlen" --nRuns 3 --warmup 2 --pipelineDepth 64 \
      --verification spot \
      --outputfile "$LOG/nupols_ircap_confirm.csv" \
      >"$LOG/nupols_ircap_${irlen}.log" 2>&1; then
    note "OK    nupols_ircap_confirm (irLength=$irlen)"
    grep -hE "Saturated|Device M|Validation" \
      "$LOG/nupols_ircap_${irlen}.log" | tee -a "$LOG/summary.log" || true
    break
  else
    note "FAIL  nupols_ircap_confirm irLength=$irlen (stepping down)"
  fi
done

# 4. The post-default-flip suite regen chip_queue4 queued but lost
# when its session host died at NoOp setup: the committed
# RESULTS_r3_tpu_v5e.json still records PartConv form=ring while the
# shipped default is shift. Snapshot the committed JSON for the
# noise-aware gate, regen, compare.
git show HEAD:docs/RESULTS_r3_tpu_v5e.json > /tmp/r3_committed.json
run_step regen 10800 bash tools/regen_artifacts.sh r3
run_step compare 600 python tools/compare_runs.py \
  /tmp/r3_committed.json docs/RESULTS_r3_tpu_v5e.json

note "=== chip_queue6 done ==="
