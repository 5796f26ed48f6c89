"""RndMem DMA-pipeline tuning sweep (on-chip).

The gather kernel (ops/rndmem_pallas.py) starts ``tracks_per_step``
DMAs per grid step and cycles ``n_slots`` scratch buffers, so up to
tps x (n_slots - 1) random 4 KiB reads are outstanding while a step's
cut-out computes. The shipped default (32 x 2) measured 87.8 GB/s of
useful gather bandwidth at 16384 tracks -- 13% of the 660 GB/s stream
peak -- and random-access DRAM efficiency should rise with outstanding
requests, so this sweeps the two knobs and reports device-equivalent
ms/dispatch and useful GB/s per configuration.

Timing: each config is the harness's own saturated tier --
``barrier_chain`` (optimization_barrier ties block k+1's inputs to
block k's output, so the loop-invariant gather cannot be hoisted out
of the scan; a carry-fold of one output element is NOT enough, XLA
LICM'd exactly that in this tool's first version and reported an
impossible 112 TB/s) + ``measure_saturated`` (real 1-element-probe
D2H sync); per-dispatch = wall / DEPTH, amortizing dispatch latency.

Usage: python tools/rndmem_tune.py [out.md] [--tracks N] [--poolMiB M]
"""

from __future__ import annotations

import _pathfix  # noqa: F401,E402 - repo-root sys.path (tools/_pathfix.py)

import argparse

GRID = [(32, 2), (32, 3), (32, 4), (64, 2), (64, 3), (16, 4), (128, 2)]
DEPTH = 64
REPS = 5


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("out", nargs="?", default="")
    ap.add_argument("--tracks", type=int, default=16384)
    ap.add_argument("--poolMiB", type=int, default=512)
    ap.add_argument("--bufferSize", type=int, default=512)
    ap.add_argument("--depth", type=int, default=DEPTH)
    ap.add_argument("--reps", type=int, default=REPS)
    ap.add_argument("--interpret", action="store_true",
                    help="Pallas interpret mode (hardware-free smoke; "
                         "timings are meaningless)")
    args = ap.parse_args()
    depth, reps = args.depth, args.reps

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gpuaudiobench_tpu.ops.rndmem_pallas import (
        POOL_PAD,
        rndmem_gather_pallas,
    )

    t, s = args.tracks, args.bufferSize
    logical = args.poolMiB * (1 << 20) // 4
    rng = np.random.default_rng(42)
    pool = jax.device_put(jnp.asarray(
        rng.random(logical + POOL_PAD, dtype=np.float32)))
    ph0 = jax.device_put(jnp.asarray(
        rng.integers(0, logical - s, t).astype(np.int32)))
    tmpl = jnp.zeros((t, s), jnp.float32)

    from gpuaudiobench_tpu.harness.streaming import (
        barrier_chain,
        measure_saturated,
    )

    def make_gather(tps, slots):
        def fn(pool, ph):
            return rndmem_gather_pallas(
                pool, ph, tmpl, logical_len=logical,
                tracks_per_step=tps, n_slots=slots)

        return fn

    import contextlib

    from jax.experimental.pallas import tpu as pltpu

    def ctx():  # single-use CM: construct per config
        return (pltpu.force_tpu_interpret_mode() if args.interpret
                else contextlib.nullcontext())

    useful = t * s * 4
    rows = []
    for tps, slots in GRID:
        if t % tps:
            continue
        step, carry = barrier_chain(make_gather(tps, slots), pool, ph0)
        with ctx():
            lats = measure_saturated(step, carry, depth, reps=reps)
        ms = min(lats)
        gbs = useful / (ms / 1e3) / 1e9
        rows.append((tps, slots, ms, gbs))
        print(f"tps={tps:4d} slots={slots} : {ms:.4f} ms/dispatch "
              f"{gbs:7.1f} GB/s useful", flush=True)

    rows.sort(key=lambda r: r[2])
    lines = [
        "# RndMem DMA-pipeline tuning sweep",
        "",
        f"{t} tracks x {s} samples from a {args.poolMiB} MiB pool; "
        f"chained scan depth {depth}, min of {reps} reps "
        "(dispatch-amortized; sync is the harness's 1-element probe "
        "read). Useful GB/s counts the gathered window bytes only "
        "(the tile-rounded fetch moves ~2x that).",
        "",
        "| tps | slots | ms/dispatch | useful GB/s |",
        "|---:|---:|---:|---:|",
    ]
    lines += [f"| {a} | {b} | {c:.4f} | {d:.1f} |" for a, b, c, d in rows]
    text = "\n".join(lines) + "\n"
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(text)
        print(f"written: {args.out}")
    else:
        print(text)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
