"""One-source the README headline from committed artifacts.

VERDICT r4 weak #6: the README's hand-maintained headline paragraph
drifted from the artifacts within one bench run (957 vs 968 blocks/sec;
"92% of VPU peak" quoting an uncited config). This tool generates the
headline block between ``<!-- headline:begin -->`` and
``<!-- headline:end -->`` in README.md from the SAME artifacts the
tables are generated from, and ``--check`` mode (pinned by
tests/test_artifacts.py) makes drift test-impossible:

* ``BENCH_r0N.json`` (latest round) -- modal ms/block, blocks/sec,
  vs-baseline multiple.
* ``docs/RESULTS_rN_tpu_v5e.json`` (latest suite regen) -- the modal
  suite row's roofline %-of-peak, with its mode count cited.
* ``docs/cap_rN_{session,rndmem,iir}.json`` (latest per family) --
  capacity walls, including the bracket fields when present
  (certified vs edge, VERDICT r4 next #4).
* ``docs/RESULTS_rN_overlap.json`` -- overlapped-infeed range, stated
  WITH the co-located qualifier (ADVICE r4: the relay-rig multiple is
  RPC amortization and upper-bounds any co-located gain).

Usage:
    python tools/readme_headline.py            # rewrite README block
    python tools/readme_headline.py --check    # exit 1 on drift
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
DOCS = os.path.join(ROOT, "docs")
BEGIN, END = "<!-- headline:begin -->", "<!-- headline:end -->"
BASELINE_PC_P50_MS = 3.168  # BASELINE.md tab4: Modal 1M, RTX 4070 p50


def _latest(pattern: str) -> str | None:
    """Highest-round artifact matching ``pattern`` (rN sorts by N)."""
    def round_of(p):
        m = re.search(r"_r0?(\d+)", os.path.basename(p))
        return int(m.group(1)) if m else -1

    files = sorted(glob.glob(pattern), key=round_of)
    return files[-1] if files else None


def _load(path: str | None):
    if path is None:
        return None
    with open(path) as f:
        return json.load(f)


def _rel(path: str) -> str:
    return os.path.relpath(path, ROOT)


def _fmt_tracks(n: int) -> str:
    return f"{n:,}"


def generate() -> str:
    parts = []

    # -- modal headline: BENCH json ------------------------------------
    bench_path = _latest(os.path.join(ROOT, "BENCH_r0*.json"))
    bench = _load(bench_path)
    if bench and "value" not in bench:
        # Driver wrapper format: the bench.py JSON line is embedded in
        # the "tail" field.
        for line in reversed((bench.get("tail") or "").splitlines()):
            try:
                cand = json.loads(line)
            except (json.JSONDecodeError, ValueError):
                continue
            if isinstance(cand, dict) and "value" in cand:
                bench = cand
                break
        else:
            bench = None
    suite_path = _latest(os.path.join(DOCS, "RESULTS_r*_tpu_v5e.json"))
    suite = _load(suite_path) or []
    modal_row = next(
        (r for r in suite if r.get("benchmark") == "ModalFilterBank"), None
    )
    if bench:
        v = bench["value"]
        bps = bench.get("blocks_per_sec_per_chip", 1000.0 / v)
        ratio = bench.get("vs_baseline", BASELINE_PC_P50_MS / v)
        s = (
            f"**Headline (v5e, 1 chip):** 1M-mode modal synthesis of a "
            f"512-sample block in **{v:.2f} ms** (saturated rep-median, "
            f"{bps:.0f} blocks/sec) vs the reference's "
            f"{BASELINE_PC_P50_MS} ms on an RTX 4070 — "
            f"**{ratio:.1f}× faster** (`{_rel(bench_path)}`)."
        )
        marg = bench.get("saturated_marginal_p50_ms")
        if marg:
            s += (
                f" The depth-differenced marginal per-block cost — the "
                f"chip's rate with the rig's sync floor cancelled — is "
                f"**{marg:.2f} ms** ({1000.0 / marg:.0f} blocks/sec)."
            )
        parts.append(s)
    if modal_row:
        rl = (modal_row.get("metadata") or {}).get("roofline")
        modes = (modal_row.get("metadata") or {}).get("numModes")
        if rl and rl.get("flops_pct_of_peak") is not None:
            modes_s = f"{modes:,}-mode" if modes else "suite"
            parts.append(
                f"The {modes_s} suite configuration runs at "
                f"**{rl['achieved_gflops'] / 1000.0:.1f} TFLOP/s = "
                f"{rl['flops_pct_of_peak']:.0f}% of the chip's "
                f"*measured* {rl['unit'].upper()} peak** — the suite "
                f"calibrates its own roofline denominators on-chip "
                f"(`{_rel(suite_path)}`)."
            )

    # -- capacity walls ------------------------------------------------
    wall_bits = []
    for fam, noun in (
        ("session", "mixing-session strips (4-stage EQ → reverb send → "
                    "stereo mixdown)"),
        ("iir", "biquad IIR tracks"),
        ("rndmem", "granular random-memory tracks (512 MiB pool)"),
    ):
        cap_path = _latest(os.path.join(DOCS, f"cap_r*_{fam}.json"))
        cap = _load(cap_path)
        if not cap:
            continue
        n = cap["capacity"]
        bracket = cap.get("bracket")
        if bracket:
            wall_bits.append(
                f"**{_fmt_tracks(bracket['certified'])}** {noun} "
                f"certified (edge {_fmt_tracks(bracket['edge'])}"
                + (f", {bracket.get('note')}" if bracket.get("note") else "")
                + f"; `{_rel(cap_path)}`)"
            )
        else:
            wall_class = cap.get("wall_class", "deadline")
            wall_bits.append(
                f"**{_fmt_tracks(n)}** {noun} "
                f"({wall_class} wall; `{_rel(cap_path)}`)"
            )
    if wall_bits:
        parts.append(
            "Measured real-time capacity walls at 48 kHz / 512 samples "
            "(saturated p99 vs the 10.667 ms deadline, fresh-process "
            "confirmed): " + "; ".join(wall_bits) + "."
        )

    # -- overlapped infeed, with the co-located qualifier --------------
    ov_path = _latest(os.path.join(DOCS, "RESULTS_r*_overlap.json"))
    ov = _load(ov_path)
    if ov:
        ratios = sorted(
            o["overlapped"]["speedup_vs_serial"]
            for o in ov.values()
            if isinstance(o, dict) and o.get("overlapped")
        )
        if ratios:
            parts.append(
                f"Double-buffered infeed (`--overlapDepth`) measures "
                f"**{ratios[0]:.1f}–{ratios[-1]:.1f}×** over serial "
                f"round trips on the relay rig — a ratio dominated by "
                f"RPC-sync amortization (the serial twin pays the "
                f"relay's per-block sync floor), so it UPPER-BOUNDS any "
                f"co-located gain; the co-located projection puts the "
                f"true overlap benefit near 1× for compute-bound "
                f"workloads and ~1.5× where transfers rival compute "
                f"(`{_rel(ov_path)}`, "
                f"projected_overlapped_ms vs projected_colocated_ms)."
            )

    # -- buffer-64 low-latency floor (r5) ------------------------------
    o64_path = _latest(os.path.join(DOCS, "RESULTS_r*_overlap64.json"))
    o64 = _load(o64_path)
    if o64 and o64.get("rows"):
        meets = [r for r in o64["rows"]
                 if r.get("meets_deadline_64") and r.get("best_ms")]
        if meets:
            vals = sorted(r["best_ms"] for r in meets)
            names = ", ".join(r["benchmark"] for r in meets)
            parts.append(
                f"At the 64-sample low-latency operating point "
                f"(1.333 ms deadline), batching blocks per upload RPC "
                f"runs {names} at "
                f"**{vals[0]:.2f}–{vals[-1]:.2f} ms/block UNDER the "
                f"deadline through the relay** (the r4 floor was "
                f"1.6–2.2 ms; batching trades added input latency for "
                f"deadline-floor throughput — "
                f"`docs/{os.path.basename(o64_path)}`)."
            )

    # -- transfer tier (tab5) and rndmem sweep (tab6), r5+ -------------
    tab5_path = _latest(os.path.join(DOCS, "RESULTS_r*_tab5.json"))
    tab5 = _load(tab5_path)
    if tab5 and tab5.get("rows"):
        ovls = sorted(r["tpu_overlapped_ms"] for r in tab5["rows"]
                      if r.get("tpu_overlapped_ms"))
        if ovls:
            pc_beats = sum(
                1 for r in tab5["rows"]
                if r.get("tpu_overlapped_ms") and r.get("pc_ms")
                and r["tpu_overlapped_ms"] < r["pc_ms"])
            parts.append(
                f"At the poster's 100 MiB transfer tier (tab5), the "
                f"pinned + overlapped path runs "
                f"**{ovls[0]:.1f}–{ovls[-1]:.1f} ms/block** across the "
                f"five I/O ratios — under the published PC pinned-PCIe "
                f"p50s (9.09–10.06 ms) at {pc_beats}/{len(tab5['rows'])}"
                f" ratios, though not the Apple-unified ~0.15 ms "
                f"no-copy path "
                f"(`docs/{os.path.basename(tab5_path)}`)."
            )
    tab6_path = _latest(os.path.join(DOCS, "RESULTS_r*_rndmem.json"))
    tab6 = _load(tab6_path)
    if tab6 and tab6.get("rows"):
        rows = tab6["rows"]
        n_rows = len(rows)

        def beats(col, base):
            return sum(1 for r in rows
                       if r.get(col) is not None
                       and r.get(base) is not None
                       and r[col] < r[base])

        mc_pc = beats("tpu_marginal_ms", "rtx4070_ms")
        mc_m2 = beats("tpu_marginal_ms", "m2pro_ms")
        pj_pc = beats("tpu_projected_colocated_ms", "rtx4070_ms")
        pj_m2 = beats("tpu_projected_colocated_ms", "m2pro_ms")
        parts.append(
            f"The granular random-memory gather's chip compute beats "
            f"BOTH published baselines' full round trips at "
            f"{min(mc_pc, mc_m2)}/{n_rows} published track counts "
            f"(tab6 complete, 32–65,536); the projected co-located "
            f"round trip — download included at PCIe-class rate — "
            f"beats the RTX 4070 at {pj_pc}/{n_rows} and the M2 Pro "
            f"at {pj_m2}/{n_rows} (above 4,096 tracks the M2's "
            f"unified memory wins the transfer, not the compute; "
            f"`docs/{os.path.basename(tab6_path)}`)."
        )

    return "\n".join([BEGIN] + [p for p in parts] + [END])


def process(readme_path: str, check: bool = False) -> bool:
    """Regenerate the headline block; returns True when it changed."""
    text = open(readme_path).read()
    if BEGIN not in text or END not in text:
        raise ValueError(f"{readme_path} has no headline markers")
    pattern = re.compile(
        re.escape(BEGIN) + r".*?" + re.escape(END), re.S
    )
    new_block = generate()
    new_text = pattern.sub(lambda _: new_block, text)
    changed = new_text != text
    if changed and not check:
        with open(readme_path, "w") as f:
            f.write(new_text)
    return changed


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true",
                    help="exit 1 if README drifted from the artifacts")
    ap.add_argument("--readme", default=os.path.join(ROOT, "README.md"))
    args = ap.parse_args(argv)
    changed = process(args.readme, check=args.check)
    if args.check:
        if changed:
            print("README headline DRIFTED from artifacts "
                  "(run tools/readme_headline.py to regenerate)")
            return 1
        print("README headline matches artifacts")
        return 0
    print("README headline " + ("regenerated" if changed else "unchanged"))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
