"""Render RESULTS markdown tables FROM the suite JSON artifact.

Round 2 shipped a hand-maintained suite table in RESULTS_r2.md that
drifted ~10-25% from the regenerated CSV (VERDICT r2 weak #1: two
sources of truth, the doc quietly showing the luckier run). This tool
makes that class of drift structurally impossible: the markdown tables
are GENERATED from the same JSON the harness wrote, inside sentinel
blocks, and ``--check`` fails if a doc's generated blocks do not match
its artifact -- which tests/test_artifacts.py enforces on every shipped
RESULTS_r*.md.

Sentinels (the renderer owns everything between them):

    <!-- BEGIN generated:suite from RESULTS_rN_tpu_v5e.json -->
    ...table...
    <!-- END generated:suite -->

Sections: ``suite`` (device / saturated / blocks/s / max err),
``roofline`` (achieved rates vs measured peaks), ``projection``
(co-located round-trip projection vs relay round trip).

Usage:
    python tools/render_results.py docs/RESULTS_r3.md          # rewrite
    python tools/render_results.py docs/RESULTS_r3.md --check  # verify
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

BEGIN_RE = re.compile(
    r"<!-- BEGIN generated:(?P<section>[a-z]+) from (?P<src>[^ ]+) -->"
)
END_FMT = "<!-- END generated:{section} -->"


def _label(r: dict) -> str:
    """Benchmark display label with the qualifiers the narrative tables
    used to hand-write, derived from the result's own metadata."""
    name = r["benchmark"]
    md = r.get("metadata") or {}
    if "eqStages" in md:
        return f"{name} ({md['eqStages']}-stage EQ, IR {md['irLength']})"
    if "irLength" in md:
        return f"{name} (IR {md['irLength']})"
    if "numModes" in md:
        return f"{name} ({md['numModes'] / 1000:g}k modes)"
    if "grid" in md:
        g = md["grid"]
        return f"{name} ({g[0]}³ × {md['stepsPerSample']} steps/sample)"
    if "poolMiB" in md:
        return f"{name} ({md['poolMiB']} MiB pool)"
    if "numStages" in md:
        return f"{name} ({md['numStages']} stages)"
    if "mesh" in md and isinstance(md["mesh"], dict):
        m = md["mesh"]
        return f"{name} (mesh {m['dp']},{m['tp']},{m['sp']})"
    if "devices" in md:
        return f"{name} ({md['devices']} device{'s' if md['devices'] != 1 else ''})"
    return name


def render_suite(results: list) -> str:
    # r5 JSONs carry the marginal saturated tier (rig sync floor
    # cancelled, VERDICT r4 weak #1); render it next to the amortized
    # wall/depth and label which one blocks/s derives from. Pre-r5
    # JSONs (no marginal field) render with the original header so
    # re-renders of shipped artifacts stay byte-identical.
    has_marginal = any(
        (r.get("saturated") or {}).get("marginal") for r in results
    )
    if has_marginal:
        lines = [
            "| Benchmark | device ms [method] | sat amortized ms/block "
            "(wall/depth) | sat marginal ms/block | blocks/s [basis] | "
            "stability (CV) | max err |",
            "|---|---:|---:|---:|---:|---|---:|",
        ]
    else:
        lines = [
            "| Benchmark | device ms [method] | saturated ms/block | blocks/s | stability (CV) | max err |",
            "|---|---:|---:|---:|---|---:|",
        ]
    for r in results:
        d = r.get("device_statistics") or {}
        sat = r.get("saturated")
        # Per-row timing-method label (VERDICT r3 weak #6): a "wall"
        # device number (relay-floor-contaminated) must never sit
        # unmarked beside xplane numbers in a rendered table.
        method = d.get("method", "")
        dev_ms = (
            f"{d['median_ms']:.4f} [{method}]" if d and method
            else (f"{d['median_ms']:.4f}" if d else "—")
        )
        marg_ms = "—"
        if sat:
            sat_ms = f"{sat['p50_ms']:.3f}"
            bps = f"{sat['blocks_per_sec']:.0f}"
            marg = sat.get("marginal")
            if marg is not None:
                marg_ms = f"{marg['p50_ms']:.4f}"
            basis = sat.get("blocks_per_sec_basis")
            if has_marginal and basis:
                bps = f"{bps} [{basis}]"
            # Variance of the tier the row headlines: saturated when
            # present, else the (round-trip) statistics tier -- the
            # datacopy rows' round-trip variance stops being silent.
            cv, rating = sat.get("cv_percent"), sat.get("stability")
        else:
            sat_ms, bps = "n/a (transfer-bound)", "—"
            cv, rating = None, None
        if cv is None:
            cv = r["statistics"].get("cv_percent")
            rating = r["statistics"].get("stability")
        cv_s = f"{rating} ({cv:.0f}%)" if cv is not None else "—"
        err = r.get("validation", {}).get("max_error", 0.0)
        err_s = "0" if err == 0 else f"{err:.3g}"
        if has_marginal:
            lines.append(
                f"| {_label(r)} | {dev_ms} | {sat_ms} | {marg_ms} | "
                f"{bps} | {cv_s} | {err_s} |"
            )
        else:
            lines.append(
                f"| {_label(r)} | {dev_ms} | {sat_ms} | {bps} | {cv_s} | {err_s} |"
            )
    return "\n".join(lines)


def render_roofline(results: list) -> str:
    lines = [
        "| Benchmark | basis | GFLOP/s | % of peak | GB/s | % of HBM | bound | peak source |",
        "|---|---|---:|---:|---:|---:|---|---|",
    ]
    for r in results:
        rl = (r.get("metadata") or {}).get("roofline")
        if not rl:
            continue
        pct = rl.get("flops_pct_of_peak")
        pct_s = f"{pct:.1f}% ({rl['unit']})" if pct is not None else "—"
        gf = rl["achieved_gflops"]
        bound = rl["bound"]
        if bound == "latency" and "nearest_wall" in rl:
            bound = (
                f"latency (nearest wall {rl['nearest_wall']} "
                f"{rl['nearest_wall_pct']:.1f}%)"
            )
        lines.append(
            f"| {_label(r)} | {rl['basis']} | "
            f"{gf:.1f} | {pct_s} | {rl['achieved_gbps']:.1f} | "
            f"{rl['hbm_pct_of_peak']:.1f}% | {bound} | "
            f"{rl.get('peak_source', 'spec-estimate')} |"
        )
    return "\n".join(lines)


def render_projection(results: list) -> str:
    lines = [
        "| Benchmark | device ms | transfers ms (PCIe-class) | projected serial ms | projected overlapped ms | relay round-trip p50 | deadline (projected) |",
        "|---|---:|---:|---:|---:|---:|---|",
    ]
    for r in results:
        p = (r.get("metadata") or {}).get("projection")
        if not p:
            continue
        rt = r["statistics"]["p50_ms"]
        deadline = r["deadline"]["threshold_ms"]
        verdict = "meets" if p["projected_colocated_ms"] <= deadline else "MISSES"
        # Overlapped-infeed bound absent in pre-r4 JSONs.
        ovl = p.get("projected_overlapped_ms")
        ovl_s = f"{ovl:.3f}" if ovl is not None else "—"
        lines.append(
            f"| {_label(r)} | {p['device_ms']:.4f} | {p['transfer_ms']:.3f} | "
            f"**{p['projected_colocated_ms']:.3f}** | {ovl_s} | "
            f"{rt:.1f} | {verdict} |"
        )
    return "\n".join(lines)


RENDERERS = {
    "suite": render_suite,
    "roofline": render_roofline,
    "projection": render_projection,
}


def process(md_path: str, check: bool = False) -> list:
    """Rewrite (or verify) every generated block in ``md_path``.
    Returns a list of drift descriptions (empty = in sync)."""
    text = open(md_path).read()
    out, pos, drift = [], 0, []
    for m in BEGIN_RE.finditer(text):
        section, src = m.group("section"), m.group("src")
        if section not in RENDERERS:
            raise ValueError(f"{md_path}: unknown generated section {section}")
        end_marker = END_FMT.format(section=section)
        end = text.find(end_marker, m.end())
        if end < 0:
            raise ValueError(f"{md_path}: missing {end_marker}")
        src_path = os.path.join(os.path.dirname(md_path), src)
        results = json.load(open(src_path))
        if isinstance(results, dict):
            results = [results]
        rendered = RENDERERS[section](results)
        current = text[m.end():end].strip("\n")
        if current != rendered:
            drift.append(f"{md_path}: generated:{section} drifted from {src}")
        out.append(text[pos:m.end()])
        out.append("\n" + rendered + "\n")
        pos = end
    out.append(text[pos:])
    if not check:
        with open(md_path, "w") as f:
            f.write("".join(out))
    return drift


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("md", nargs="+", help="RESULTS_*.md files with sentinels")
    ap.add_argument("--check", action="store_true",
                    help="verify only; exit 1 on drift")
    args = ap.parse_args(argv)
    all_drift = []
    for md in args.md:
        all_drift += process(md, check=args.check)
    for d in all_drift:
        print(f"DRIFT: {d}", file=sys.stderr)
    if args.check and all_drift:
        return 1
    if not args.check:
        print(f"rendered {len(args.md)} file(s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
