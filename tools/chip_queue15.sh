#!/usr/bin/env bash
# Fifteenth on-chip batch (round 4): runs AFTER chip_queue14. The
# round-4 feature measurements plus fresh-process confirmations of any
# new capacity walls queue14 found. Ordering: guaranteed-completion
# items first; every artifact lands in docs/ and is committed
# immediately.
#
#   1. regen_r4      — full-suite artifact regen (RESULTS_r4_tpu_v5e
#                      JSON→CSV→md→html, one run, nRuns 20 depth 256)
#                      with the r4 context columns / honest roofline /
#                      overlapped projection bound.
#   2. overlap       — serial-vs-overlapped infeed campaign
#                      (tools/overlap_campaign.py) incl. pinned-host
#                      A/B metadata in the datacopy rows.
#   3. attrib        — latency attribution sweeps (fixed-vs-marginal
#                      fit) for DWG1DNaive / IIRFilter / gain.
#   4. confirms      — fresh-process confirmation runs at the walls
#                      queue14's searches found (clean arena;
#                      OPERATIONS.md rule).
#   5. capacity doc  — merge cap_r4_*.json (+ r3 records that stand)
#                      into docs/RESULTS_r4_capacity.md; regenerate
#                      mesh predictions from the upgraded anchors.
#
# Logs in /tmp/chip_queue15/ (disposable; artifacts live in docs/).
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/chip_queue15
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

commit_art() { # msg path...
  local msg=$1; shift
  local i
  for i in 1 2 3 4 5; do
    if git add -- "$@" >>"$LOG/git.log" 2>&1 \
        && git commit -m "$msg" -- "$@" >>"$LOG/git.log" 2>&1; then
      note "COMMIT $*"
      return 0
    fi
    sleep 7
  done
  note "COMMIT-FAIL $* (see $LOG/git.log)"
}

note "=== chip_queue15 run ==="

if ! timeout 120 python -c "import jax; print(jax.devices())" >"$LOG/probe.log" 2>&1; then
  note "ABORT relay unhealthy (probe timed out/failed)"
  exit 2
fi
note "probe ok: $(tail -1 "$LOG/probe.log")"

run_step quietcheck 600 python -m gpuaudiobench_tpu.cli \
  --benchmark gain --nRuns 10 --no-device-timing
grep -E "Run-to-run CV|p50" "$LOG/quietcheck.log" \
  | tee -a "$LOG/summary.log" || true

# 0. PartConv soak re-run: queue14's soak_partconv window collided
# with an interactive overlap-campaign smoke run on the serialized
# relay (~11:56), which shows up as its single 52.99 ms outlier
# second. Re-measure without a competing session.
run_step soak_partconv 1200 python tools/soak.py 120 \
  docs/RESULTS_r4_soak_partconv.md PartConv 1024
commit_art "Soak re-run: PartConv 120 s without the competing relay session" \
  docs/RESULTS_r4_soak_partconv.md

# 1. Full-suite regen with the round-4 surface.
run_step regen_r4 7200 bash tools/regen_artifacts.sh r4
commit_art "RESULTS_r4: full-suite regen (context columns, honest roofline, overlapped projection bound)" \
  docs/RESULTS_r4_tpu_v5e.json docs/RESULTS_r4_tpu_v5e.csv \
  docs/RESULTS_r4.md docs/report_r4.html

# 2. Overlapped-infeed campaign.
run_step overlap 3600 python tools/overlap_campaign.py \
  docs/RESULTS_r4_overlap.md --depth 64 --reps 7
commit_art "Overlap campaign: measured serial vs double-buffered infeed + pinned A/B" \
  docs/RESULTS_r4_overlap.md docs/RESULTS_r4_overlap.json

# 3. Latency attribution sweeps.
run_step attrib 3600 python tools/latency_attrib.py \
  docs/RESULTS_r4_latency_attrib.md
commit_art "Latency attribution: fixed-vs-marginal fits behind the latency-bound labels" \
  docs/RESULTS_r4_latency_attrib.md

# 3b. RndMem track sweep (tab6 analog) refresh on the new tps=128
# default (docs/RESULTS_r4_rndmem_tune.md adoption).
run_step rndmem_sweep 3600 python tools/rndmem_sweep.py \
  docs/RESULTS_r4_rndmem.md
commit_art "RndMem tab6-analog sweep on the tps=128 pipeline default" \
  docs/RESULTS_r4_rndmem.md || true

# 4. Fresh-process confirmations at queue14's walls.
confirm() { # name benchmark extra_flags...
  local name=$1 bench=$2; shift 2
  local capv
  capv=$(python - "docs/cap_r4_$name.json" <<'EOF'
import json, sys
try:
    print(json.load(open(sys.argv[1]))["capacity"] or "")
except Exception:
    print("")
EOF
)
  if [ -z "$capv" ]; then
    note "SKIP  confirm_$name (no capacity in docs/cap_r4_$name.json)"
    return
  fi
  note "confirm_$name at $capv"
  run_step "confirm_$name" 3600 python -m gpuaudiobench_tpu.cli \
    --benchmark "$bench" --nRuns 3 --warmup 2 \
    --pipelineDepth 16 --verification spot "$@" \
    --nTracks "$capv" \
    --json --outputfile "docs/confirm_r4_$name.json"
  commit_art "Capacity confirm ($bench @ $capv, fresh process)" \
    "docs/confirm_r4_$name.json" || true
}
confirm rndmem RndMemRead
confirm session DAWSessionMix
confirm iir IIRFilter
# modal64's knob is modes, not tracks.
capm=$(python - docs/cap_r4_modal64.json <<'EOF'
import json
try:
    print(json.load(open("docs/cap_r4_modal64.json"))["capacity"] or "")
except Exception:
    print("")
EOF
)
if [ -n "$capm" ]; then
  note "confirm_modal64 at $capm modes"
  run_step confirm_modal64 3600 python -m gpuaudiobench_tpu.cli \
    --benchmark ModalFilterBank --bufferSize 64 --modalModes "$capm" \
    --nRuns 3 --warmup 2 --pipelineDepth 256 --verification spot \
    --json --outputfile docs/confirm_r4_modal64.json
  commit_art "Capacity confirm (modal buf-64 @ $capm modes, fresh process)" \
    docs/confirm_r4_modal64.json
else
  note "SKIP  confirm_modal64 (no capacity in docs/cap_r4_modal64.json)"
fi

# 5. Merged capacity doc + refreshed mesh predictions.
run_step cap_merge 600 python tools/merge_capacity.py \
  docs/RESULTS_r4_capacity.md docs/cap_r4_*.json
commit_art "RESULTS_r4_capacity: merged round-4 capacity tables" \
  docs/RESULTS_r4_capacity.md || true
run_step mesh_predict 600 python tools/mesh_predict.py \
  docs/RESULTS_r4_mesh.md
commit_art "Mesh predictions refreshed from the round-4 walls" \
  docs/RESULTS_r4_mesh.md || true

note "=== chip_queue15 done ==="
