#!/bin/bash
# Regenerate the archived suite artifacts end-to-end on the current
# hardware: full-suite CSV + JSON (one harness invocation each,
# nRuns 20, pipelineDepth 256) and the rendered HTML dashboard.
# The first run on a fresh machine pays XLA compiles; afterwards the
# persistent compilation cache makes the whole double pass ~10 min.
#
# Usage: tools/regen_artifacts.sh [suffix]   (default: r2)
set -e
cd "$(dirname "$0")/.."
SUF="${1:-r2}"
CSV="docs/RESULTS_${SUF}_tpu_v5e.csv"
JSON="docs/RESULTS_${SUF}_tpu_v5e.json"
rm -f "$CSV.tmp" "$JSON.tmp"   # a crashed run leaves appendable tmps

python -m gpuaudiobench_tpu.cli --benchmarkFilter /./ --nRuns 20 \
    --pipelineDepth 256 --outputfile "$CSV.tmp"
mv "$CSV.tmp" "$CSV"
python -m gpuaudiobench_tpu.cli --benchmarkFilter /./ --nRuns 20 \
    --pipelineDepth 256 --json --outputfile "$JSON.tmp"
mv "$JSON.tmp" "$JSON"
python tools/report.py "$JSON" -o "docs/report_${SUF}.html"
echo "artifacts: $CSV $JSON docs/report_${SUF}.html"
