"""Falsifiable multi-chip capacity predictions (VERDICT r3 next #8).

The rig has one physical chip, so the multichip layer's shardings are
validated functionally on a virtual CPU mesh and its collectives are
priced analytically (parallel/ici_model.py). This tool turns those two
ingredients plus the MEASURED single-chip capacity walls into concrete
headline predictions -- "at mesh N, one pod slice sustains X modes /
X strips in real time, spending Y us/block on the wire" -- so a future
pod run can confirm or refute specific numbers instead of a shrug.

Model per workload (stated in the emitted doc):

* modal (tp mode-sharding): per-chip compute follows the measured
  linear wall fit sat_ms(modes) = a + b*modes (anchored on two
  on-chip measurements); the psum that completes the partial mix adds
  collective_ms("psum", 32*S*4, n). Solve for modes at the deadline.
* DAWSessionMix (dp track-sharding): wire cost is O(block), not
  O(tracks) (ici_model.session_collectives), so capacity scales
  linearly in n on the compute side minus a fixed wire budget.
* IIRFilter (dp track-sharding): embarrassingly parallel -- zero
  collectives; capacity = n x the measured single-chip wall. The
  prediction is still falsifiable: a pod run that loses >2% to SPMD
  overhead refutes it.
* PartConv ir_length (partition-sharded tail): the wall is HBM
  capacity, not the deadline; n chips hold n x the tail ring, and the
  wire cost (one spectrum handoff + one psum per block) is
  INDEPENDENT of the partition count.

All collective terms are upper bounds (serial, no compute overlap);
compute terms assume perfect sharding of the measured single-chip
rate. Where a cap_r4_*.json artifact exists its confirmed wall
replaces the r3 anchor automatically.

Usage: python tools/mesh_predict.py [docs/RESULTS_r4_mesh.md]
"""

from __future__ import annotations

import _pathfix  # noqa: F401,E402 - repo-root sys.path (tools/_pathfix.py)

import json
import os
import sys

from gpuaudiobench_tpu.parallel.ici_model import (
    V5E_ICI,
    collective_ms,
    session_collectives,
)

DOCS = os.path.join(os.path.dirname(__file__), "..", "docs")
DEADLINE_MS = 1000.0 * 512 / 48000  # 10.667 ms
MESHES = (1, 2, 4, 8)


def _latest(pattern):
    import glob
    import re

    def round_of(p):
        m = re.search(r"_r0?(\d+)", os.path.basename(p))
        return int(m.group(1)) if m else -1

    files = sorted(glob.glob(pattern), key=round_of)
    return files[-1] if files else None


def _cap_from_json(name):
    """(capacity, sat_p99) from the LATEST cap_rN_<name>.json artifact
    (r5 ledgers supersede r4 automatically), or None."""
    path = _latest(os.path.join(DOCS, f"cap_r*_{name}.json"))
    if path is None:
        return None
    try:
        with open(path) as f:
            rec = json.load(f)
        cap = rec.get("capacity")
        conf = rec.get("confirmation") or {}
        p99 = conf.get("saturated_p99_ms")
        if cap:
            return int(cap), p99, os.path.basename(path)
    except (OSError, json.JSONDecodeError, ValueError):
        pass
    return None


def _bench_anchor():
    """(value_ms, label) from the latest BENCH_r0N.json (the modal 1M
    saturated rep-p50); falls back to the r3 constant when no bench
    artifact is readable (VERDICT r4 weak #9: the fit cited BENCH_r03
    while r4 existed)."""
    path = _latest(os.path.join(DOCS, "..", "BENCH_r0*.json"))
    if path is not None:
        try:
            with open(path) as f:
                rec = json.load(f)
            for line in reversed((rec.get("tail") or "").splitlines()):
                try:
                    cand = json.loads(line)
                except ValueError:
                    continue
                if isinstance(cand, dict) and "value" in cand:
                    return float(cand["value"]), os.path.basename(path)
        except (OSError, json.JSONDecodeError, ValueError):
            pass
    return 1.0312, "BENCH_r03 (fallback constant)"


def modal_wall_fit():
    """Linear sat-wall fit a + b*modes from two on-chip anchors: the
    LATEST BENCH artifact (1M modes, saturated rep p50) and the modal
    capacity wall (latest cap_r*_modal*.json when present, else the r3
    11,010,048-mode row at sat p99 10.5759,
    docs/RESULTS_r3_capacity.md)."""
    y1, src1 = _bench_anchor()
    x1 = 1_000_000
    x2, y2, src2 = 11_010_048, 10.5759, "RESULTS_r3_capacity.md"
    got = _cap_from_json("modal")
    if got and got[1]:
        x2, y2, src2 = got[0], got[1], got[2]
    b = (y2 - y1) / (x2 - x1)
    a = y1 - b * x1
    return a, b, (x1, y1, src1), (x2, y2, src2)


def predict_modal():
    a, b, (x1, y1, src1), (x2, y2, src2) = modal_wall_fit()
    rows = []
    for n in MESHES:
        wire = collective_ms("psum", 32 * 512 * 4, n)
        budget = DEADLINE_MS - a - wire
        modes = int(budget / b) * n if budget > 0 else 0
        rows.append({"n": n, "capacity": modes, "wire_ms": wire})
    return {
        "workload": "ModalFilterBank", "knob": "modes",
        "axis": "tp (mode-sharded, psum of the (32,S) mix)",
        "rows": rows, "n1_label": "fit basis",
        "anchor": f"fit a+b*modes on {src1} {x1 / 1e6:g}M = {y1:g} ms "
                  f"and the {x2 / 1e6:.2f}M-mode wall at {y2:g} ms "
                  f"({src2}) (a={a:.4f} ms, b={b * 1e6:.4f} ms/Mmode)",
    }


def predict_session():
    got = _cap_from_json("session")
    if got and got[1]:
        cap1, p99, src = got
        ceiling = False
    else:
        cap1, p99, src = 65536, 2.38, "RESULTS_r3_capacity.md (ceiling)"
        ceiling = True
    rows = []
    for n in MESHES:
        wire = sum(collective_ms(c["kind"], c["bytes"], n)
                   for c in session_collectives(512, max(n, 2)))
        wire = wire if n > 1 else 0.0
        if ceiling:
            # Only a deep-inside-deadline point exists: extrapolate
            # linearly per strip (labeled as such).
            strips = int((DEADLINE_MS - wire) / (p99 / cap1)) * n
        else:
            # Measured wall: the response is super-linear near the
            # wall (the next quantum step already missed), so linear
            # extrapolation past cap1 is not honest -- capacity scales
            # as n x the measured wall, with the (µs-scale) wire
            # budget deducted at the measured per-strip rate.
            strips = n * int(cap1 * (1.0 - wire / DEADLINE_MS))
        rows.append({"n": n, "capacity": strips, "wire_ms": wire})
    return {
        "workload": "DAWSessionMix", "knob": "channel strips",
        "axis": "dp (track-sharded; O(block) bus/mix psums)",
        "rows": rows,
        "n1_label": ("extrapolated wall; measured point is a ceiling"
                     if ceiling else "measured wall"),
        "anchor": f"single-chip {cap1} strips at sat p99 {p99} ms ({src})",
    }


def predict_iir():
    got = _cap_from_json("iir")
    if got:
        cap1, p99, src = got
        if p99 is None:
            p99, src = 10.624, src + " + q10 bracket p99"
        note = ("; this size is the measured deadline EDGE — the "
                "fresh-process confirm's p50 sits on the deadline, "
                "see RESULTS_r4_capacity.md")
    else:
        cap1, p99, src = 786432, 10.624, \
            "chip_queue10 bracket (RESULTS_r3_capacity.md)"
        note = ""
    rows = [{"n": n, "capacity": cap1 * n, "wire_ms": 0.0}
            for n in MESHES]
    return {
        "workload": "IIRFilter", "knob": "biquad tracks",
        "axis": "dp (track-sharded; zero collectives)",
        "rows": rows,
        "anchor": f"single-chip wall {cap1} tracks at sat p99 {p99} ms "
                  f"({src}){note}",
    }


def predict_partconv():
    # Memory wall: 32 s of IR fills ~3 GB of tail ring on one chip
    # (RESULTS_r3_capacity.md); n chips hold n shards of the ring.
    # Wire: one spectrum handoff + one psum per block, independent of
    # the partition count (ici_model.partconv_collectives) -- bins for
    # the 128-track head FDL at B=512: 513 complex bins.
    from gpuaudiobench_tpu.parallel.ici_model import partconv_collectives

    ir1 = 1_536_000
    rows = []
    for n in MESHES:
        wire = sum(collective_ms(c["kind"], c["bytes"], n)
                   for c in partconv_collectives(128, 513, max(n, 2)))
        wire = wire if n > 1 else 0.0
        rows.append({"n": n, "capacity": ir1 * n, "wire_ms": wire})
    return {
        "workload": "PartConv (nupols)", "knob": "IR samples",
        "axis": "sp (partition-sharded tail; wire cost independent of n)",
        "rows": rows,
        "anchor": "single-chip MEMORY wall at 1,536,000 samples = 32 s "
                  "(sat p99 1.589 ms, 6.7x inside deadline; "
                  "RESULTS_r3_capacity.md)",
    }


def render(preds) -> str:
    lines = [
        "# Predicted multi-chip capacity (falsifiable; analytic ICI "
        "model over measured single-chip walls)",
        "",
        "One physical chip is available to this rig, so these rows are "
        "PREDICTIONS, not measurements: per-chip compute is the "
        "measured single-chip wall scaled by the sharding, and every "
        "collective is priced by `parallel/ici_model.py` "
        f"({V5E_ICI['source']}) as a SERIAL, no-overlap UPPER bound. "
        "A future pod run confirms or refutes each row as stated; "
        "shardings themselves are validated on the virtual 8-device "
        "mesh (`tools/mesh_scaling.py`, `__graft_entry__.py` dryrun).",
        "",
        "Deadline basis: buffer 512 @ 48 kHz = 10.667 ms, saturated-"
        "tier criterion (p99 for measured anchors).",
        "",
    ]
    for p in preds:
        lines.append(f"## {p['workload']} — {p['knob']} ({p['axis']})")
        lines.append("")
        lines.append(f"Anchor: {p['anchor']}.")
        lines.append("")
        lines.append("| mesh N | predicted capacity @ N chips | "
                     "collective budget / block |")
        lines.append("|---:|---:|---:|")
        for r in p["rows"]:
            wire = (f"{r['wire_ms'] * 1e3:.1f} µs"
                    if r["wire_ms"] > 0 else "0 (no collectives)"
                    if r["n"] > 1 else "— (single chip)")
            cap = f"{r['capacity']:,}"
            if r["n"] == 1:
                cap += f" ({p.get('n1_label', 'measured wall')})"
            lines.append(f"| {r['n']} | {cap} | {wire} |")
        lines.append("")
    lines.append(
        "Refutation criteria: a pod measurement that misses a row's "
        "capacity by more than the wire budget's share of the deadline "
        "plus 5% SPMD overhead refutes the model; a measurement that "
        "BEATS the capacity is consistent (the wire terms are upper "
        "bounds)."
    )
    return "\n".join(lines) + "\n"


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    out = argv[0] if argv else os.path.join(DOCS, "RESULTS_r4_mesh.md")
    preds = [predict_modal(), predict_session(), predict_iir(),
             predict_partconv()]
    text = render(preds)
    with open(out, "w") as f:
        f.write(text)
    print(f"written: {out}")
    for p in preds:
        r8 = [r for r in p["rows"] if r["n"] == 8][0]
        print(f"  {p['workload']}: @8 chips -> {r8['capacity']:,} "
              f"{p['knob']} (wire {r8['wire_ms'] * 1e3:.1f} us/block)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
