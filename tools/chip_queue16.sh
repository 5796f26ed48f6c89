#!/usr/bin/env bash
# Sixteenth on-chip batch (round 4, short): residuals after queue15.
#   1. pinned_ab — re-measure the datacopy pinned-vs-pageable A/B with
#      the FIXED d2h legs (the first campaign's d2h_pageable read a
#      jax host-copy cache hit, 0.009 ms; models/datatransfer.py now
#      reads a fresh device buffer per rep).
#   2. bench_sanity — one bench.py run (the driver's headline) to
#      confirm the median-estimator path end-to-end on hardware.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/chip_queue16
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

note "=== chip_queue16 run ==="
run_step pinned_ab 1800 python - <<'EOF'
import json

from gpuaudiobench_tpu.config import BenchConfig
from gpuaudiobench_tpu.registry import create_benchmark

rows = []
for name in ("datacopy0199", "datacopy5050", "datacopy9901"):
    cfg = BenchConfig(verification="none", quiet=True,
                      write_latencies=False, device_timing=False)
    b = create_benchmark(name, cfg)
    b.setup()
    b.iterate()
    tc = b.metadata()["transferMemoryClass"]
    rows.append((name, tc))
    print(name, json.dumps(tc), flush=True)

lines = [
    "# Pinned vs pageable transfer staging (measured A/B, fixed d2h)",
    "",
    "`models/datatransfer.py _transfer_class_ab` on the axon-relay "
    "v5e: pageable H2D serializes the array into the RPC request "
    "(cost scales with size); pinned H2D uploads from the page-locked "
    "`pinned_host` staging buffer placed at setup (the cudaMallocHost "
    "analog) and costs one relay round trip regardless of size. D2H "
    "legs read a FRESH device buffer per rep (the first campaign's "
    "pageable-d2h read a jax host-copy cache hit; fixed and "
    "re-measured here). datacopy iterations run the pinned path "
    "(`h2d_path_used`).",
    "",
    "| benchmark | A/B MiB | h2d pageable ms | h2d pinned ms | "
    "d2h pageable ms | d2h pinned ms |",
    "|---|---:|---:|---:|---:|---:|",
]
for name, tc in rows:
    lines.append(
        f"| {name} | {tc.get('ab_mib','—')} | "
        f"{tc.get('h2d_pageable_ms','—')} | {tc.get('h2d_pinned_ms','—')} | "
        f"{tc.get('d2h_pageable_ms','—')} | {tc.get('d2h_pinned_ms','—')} |")
with open("docs/RESULTS_r4_pinned_ab.md", "w") as f:
    f.write("\n".join(lines) + "\n")
print("written: docs/RESULTS_r4_pinned_ab.md")
EOF
commit_art "Pinned-vs-pageable A/B re-measured with the fixed d2h legs" \
  docs/RESULTS_r4_pinned_ab.md

run_step bench_sanity 1800 python bench.py
grep -h "modal_1M" "$LOG/bench_sanity.log" | tee -a "$LOG/summary.log" || true

note "=== chip_queue16 done ==="
