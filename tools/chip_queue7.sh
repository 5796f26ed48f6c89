#!/usr/bin/env bash
# Seventh on-chip batch (round 3): the DAWSessionMix campaign.
# The composite session benchmark landed mid-chip_queue6, so queue6's
# suite regen already measures + archives it at the defaults; this
# batch gives it the same discipline every other carried-state
# workload has:
#   1. full-verification run on hardware (the Precision.HIGHEST fix's
#      on-chip confirmation -- the pre-fix run failed at ~1.4e-3),
#   2. low-latency probe at buffer 64,
#   3. track-capacity search (how many full channel strips one chip
#      mixes in real time -- the headline question for this workload),
#   4. 120 s soak (EQ z's + reverb FDL carried for minutes; the RMS
#      probes catch divergence/corruption).
#
# Logs in /tmp/chip_queue7/.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/chip_queue7
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

note "=== chip_queue7 run ==="

if ! timeout 90 python -c "import jax; print(jax.devices())" >"$LOG/probe.log" 2>&1; then
  note "ABORT relay unhealthy (probe timed out/failed)"
  exit 2
fi
note "probe ok: $(cat "$LOG/probe.log")"

# 1. Defaults, full verification: T=128 strips, 4-stage EQ, 1 s reverb.
run_step session_full 2400 python -m gpuaudiobench_tpu.cli \
  --benchmark DAWSessionMix --nRuns 20 --warmup 3 \
  --pipelineDepth 256 --verification full \
  --outputfile "$LOG/session_full.csv"
grep -hE "Saturated|Device M|Validation|Roofline|Co-located" \
  "$LOG/session_full.log" | tee -a "$LOG/summary.log" || true

# 2. Low-latency regime: buffer 64 (deadline 1.333 ms). The reverb FDL
# grows to P=750 partitions at irLength 48000 -- the long-memory
# small-block stress.
run_step session_buf64 2400 python -m gpuaudiobench_tpu.cli \
  --benchmark DAWSessionMix --bufferSize 64 --nRuns 10 --warmup 3 \
  --pipelineDepth 256 --verification spot \
  --outputfile "$LOG/session_buf64.csv"
grep -hE "Saturated|Device M|Validation" "$LOG/session_buf64.log" \
  | tee -a "$LOG/summary.log" || true

# 3. Track capacity at buffer 512: largest number of channel strips
# whose saturated p99 meets the 10.667 ms deadline.
run_step cap_session 9000 python tools/capacity.py \
  --benchmark DAWSessionMix --verification none \
  --confirmVerification spot \
  --json "$LOG/cap_session.json"
grep -h "RESULT" "$LOG"/cap_*.log 2>/dev/null \
  | tee -a "$LOG/summary.log" || true

# 4. 120 s soak at 1024 tracks: the carried-state discipline artifact
# (EQ z's + bus block + FDL streamed for minutes, RMS-probed).
run_step soak_session 3600 python tools/soak.py 120 \
  docs/RESULTS_r3_soak_session.md DAWSessionMix 1024

note "=== chip_queue7 done ==="
