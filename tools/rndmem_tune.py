"""RndMem DMA-pipeline tuning sweep (on-chip).

The gather kernel (ops/rndmem_pallas.py) starts ``tracks_per_step``
DMAs per grid step and cycles ``n_slots`` scratch buffers, so up to
tps x (n_slots - 1) random 4 KiB reads are outstanding while a step's
cut-out computes. The shipped default (32 x 2) measured 87.8 GB/s of
useful gather bandwidth at 16384 tracks -- 13% of the 660 GB/s stream
peak -- and random-access DRAM efficiency should rise with outstanding
requests, so this sweeps the two knobs and reports device-equivalent
ms/dispatch and useful GB/s per configuration.

Timing: each config is one jitted lax.scan chain of DEPTH dispatches
(carry-folds one output element so iterations serialize), timed with
block_until_ready and NO readback of computed results (the relay's
D2H-poisoning gotcha); per-dispatch = wall / DEPTH, amortizing the
dispatch latency like the harness's saturated tier.

Usage: python tools/rndmem_tune.py [out.md] [--tracks N] [--poolMiB M]
"""

from __future__ import annotations

import _pathfix  # noqa: F401,E402 - repo-root sys.path (tools/_pathfix.py)

import argparse
import functools
import time

GRID = [(32, 2), (32, 3), (32, 4), (64, 2), (64, 3), (16, 4), (128, 2)]
DEPTH = 64
REPS = 5
WARMUP = 2


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("out", nargs="?", default="")
    ap.add_argument("--tracks", type=int, default=16384)
    ap.add_argument("--poolMiB", type=int, default=512)
    ap.add_argument("--bufferSize", type=int, default=512)
    args = ap.parse_args()

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

    @functools.partial(jax.jit, static_argnames=("tps", "slots"))
    def chained(pool, ph, *, tps, slots):
        def body(c, _):
            y = rndmem_gather_pallas(
                pool, ph, tmpl, logical_len=logical,
                tracks_per_step=tps, n_slots=slots)
            # Fold one lane into the carry so iterations serialize.
            return c + y[0, 0], None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=DEPTH)
        return c

    useful = t * s * 4
    rows = []
    for tps, slots in GRID:
        if t % tps:
            continue
        f = functools.partial(chained, tps=tps, slots=slots)
        for _ in range(WARMUP):
            f(pool, ph0).block_until_ready()
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            f(pool, ph0).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        ms = 1e3 * best / DEPTH
        gbs = useful / (best / DEPTH) / 1e9
        rows.append((tps, slots, ms, gbs))
        print(f"tps={tps:4d} slots={slots} : {ms:.4f} ms/dispatch "
              f"{gbs:7.1f} GB/s useful", flush=True)

    rows.sort(key=lambda r: r[2])
    lines = [
        "# RndMem DMA-pipeline tuning sweep",
        "",
        f"{t} tracks x {s} samples from a {args.poolMiB} MiB pool; "
        f"chained scan depth {DEPTH}, min of {REPS} reps "
        "(dispatch-amortized, no readback). Useful GB/s counts the "
        "gathered window bytes only (the tile-rounded fetch moves "
        "~2x that).",
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
