#!/usr/bin/env bash
# Fourteenth on-chip batch (round 4): the twice-lost round-3 backlog
# (VERDICT r3 "Next round" #1) plus the DWG1DNaive tail re-measure
# (VERDICT #7). Ordering per OPERATIONS.md: guaranteed-completion
# items FIRST, each step individually timed out, and — the lesson paid
# for twice by chip_queue11/12 — every artifact is written directly
# into docs/ and COMMITTED TO GIT the moment it lands, so a session
# cut or /tmp wipe can no longer erase a measurement.
#
#   1. dwg_tail     — DWG1DNaive saturated tier at n=101 reps
#                     (the 26% CV / 2.3x p99 tail investigation).
#   2. soak_partconv, soak_session — the undiluted state-RMS soak
#                     refreshes (lost with queue11).
#   3. rndmem_tune  — the fixed DMA-pipeline sweep (lost with queue11).
#   4. cap_rndmem   — bounded re-search around queue9's lost 261120
#                     wall (the archived 65536 row is a search ceiling).
#   5. cap_session  — DAWSessionMix search past the 65536 ceiling.
#   6. cap_modal64  — modal-at-buffer-64 search past the 8.4M ceiling.
#   7. cap_iir      — LAST (the only multi-hour-risk step, probes move
#                     ~1.5 GiB each): quantum-16384 re-certification of
#                     the 786432-track wall inside the chip_queue10
#                     bracket. Runs with its own generous timeout so a
#                     slow window cannot starve anything above it.
#
# Fresh-process confirmations of any NEW walls found here run in a
# follow-up queue (OPERATIONS.md: confirms need a clean arena).
# Logs in /tmp/chip_queue14/ (disposable; artifacts live in docs/).
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/chip_queue14
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
  # Commit ONLY the named artifact paths (pathspec commit leaves the
  # session's other staged/unstaged work alone); retry on index.lock
  # contention with the interactive session.
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

note "=== chip_queue14 run ==="

if ! timeout 120 python -c "import jax; print(jax.devices())" >"$LOG/probe.log" 2>&1; then
  note "ABORT relay unhealthy (probe timed out/failed)"
  exit 2
fi
note "probe ok: $(tail -1 "$LOG/probe.log")"

# Quiet-window check (OPERATIONS.md): gain round-trip CV under ~5%
# marks a quiet window. Logged, not gating — the guaranteed items are
# cheap either way and the capacity steps disclose their window.
run_step quietcheck 600 python -m gpuaudiobench_tpu.cli \
  --benchmark gain --nRuns 10 --no-device-timing
grep -E "Run-to-run CV|p50" "$LOG/quietcheck.log" \
  | tee -a "$LOG/summary.log" || true

# 1. DWG1DNaive saturated-tail investigation: n=101 saturated reps at
# the archived depth (256). VERDICT r3 weak #8 / next #7.
run_step dwg_tail 2400 python -m gpuaudiobench_tpu.cli \
  --benchmark DWG1DNaive --nRuns 10 --pipelineDepth 256 \
  --saturatedReps 101 --verification spot \
  --json --outputfile docs/RESULTS_r4_dwg_tail.json
commit_art "DWG1DNaive tail re-measure: 101-rep saturated tier artifact" \
  docs/RESULTS_r4_dwg_tail.json

# 2. Soak refreshes on the undiluted state-RMS metric (lost w/ queue11).
run_step soak_partconv 1200 python tools/soak.py 120 \
  docs/RESULTS_r4_soak_partconv.md PartConv 1024
commit_art "Soak refresh: PartConv 120 s, undiluted state-RMS" \
  docs/RESULTS_r4_soak_partconv.md
run_step soak_session 1200 python tools/soak.py 120 \
  docs/RESULTS_r4_soak_session.md DAWSessionMix 1024
commit_art "Soak refresh: DAWSessionMix 120 s, undiluted state-RMS" \
  docs/RESULTS_r4_soak_session.md
grep -hE "state RMS|ms/block \(mean\)|deadline" \
  "$LOG"/soak_*.log 2>/dev/null | tee -a "$LOG/summary.log" || true

# 3. The fixed rndmem_tune sweep (lost with queue11; the LICM-broken
# first sweep is documented in OPERATIONS.md).
run_step rndmem_tune 2400 python tools/rndmem_tune.py \
  docs/RESULTS_r4_rndmem_tune.md
commit_art "RndMem DMA-pipeline sweep on the fixed (barrier_chain) tool" \
  docs/RESULTS_r4_rndmem_tune.md

# 4. RndMemRead wall re-search, bounded around queue9's lost 261120.
run_step cap_rndmem 3600 python tools/capacity.py \
  --benchmark RndMemRead --verification none --maxEvals 8 \
  --nRuns 3 --warmup 2 --pipelineDepth 16 \
  --lo 212992 --hi 393216 --quantum 16384 --json docs/cap_r4_rndmem.json
commit_art "Capacity: RndMemRead wall re-search past the 65536 ceiling" \
  docs/cap_r4_rndmem.json

# 5. DAWSessionMix wall search past the 65536 ceiling.
run_step cap_session 5400 python tools/capacity.py \
  --benchmark DAWSessionMix --verification none --maxEvals 10 \
  --nRuns 3 --warmup 2 --pipelineDepth 16 \
  --lo 65536 --hi 1048576 --quantum 16384 --json docs/cap_r4_session.json
commit_art "Capacity: DAWSessionMix search past the 65536 ceiling" \
  docs/cap_r4_session.json

# 6. Modal-at-buffer-64 search past the 8388608 ceiling.
run_step cap_modal64 5400 python tools/capacity.py \
  --benchmark ModalFilterBank --bufferSize 64 --verification none \
  --maxEvals 8 --nRuns 3 --warmup 2 \
  --lo 8388608 --hi 33554432 --quantum 262144 \
  --json docs/cap_r4_modal64.json
commit_art "Capacity: modal buffer-64 search past the 8.4M ceiling" \
  docs/cap_r4_modal64.json

# 7. LAST: the IIR 786k-track wall re-certification inside the
# chip_queue10 bracket (786432 sustains / 1048576 misses), quantum
# 16384. Probes here move ~1.5 GiB of input each and have taken
# 25+ min in a slow window — its own timeout, nothing queued after.
run_step cap_iir 10800 python tools/capacity.py \
  --benchmark IIRFilter --verification none --maxEvals 6 \
  --nRuns 3 --warmup 2 --pipelineDepth 16 \
  --lo 786432 --hi 1048576 --quantum 16384 --json docs/cap_r4_iir.json
commit_art "Capacity: IIR wall re-certification (quantum 16384, q10 bracket)" \
  docs/cap_r4_iir.json

note "=== chip_queue14 done ==="
