"""Pallas TPU kernel for the random-memory (granular) gather.

The XLA path (ops/rndmem.py) lowers the per-track dynamic slices to a
gather; this kernel expresses the access pattern the benchmark is
*about* natively: the 512 MiB sample pool stays in HBM (never blocked
into VMEM), per-track playheads arrive as scalar-prefetch operands, and
each track's window is fetched with its own async DMA HBM->VMEM -- the
TPU analog of the CUDA kernel's non-coalesced per-track copies
(bench_rndmem.cu:7-20).

HBM row slices may start at ANY row, but their row count must be a
tile multiple (Mosaic rejects e.g. 6-row slices as "unsupported
unaligned shape"). Each track fetches the tile-rounded row cover of
its window starting at the playhead's own row (8 rows / 4 KiB for the
default 512-sample buffer); the unaligned window always lives in the
first rows (``POOL_PAD`` tail slack keeps the fetch in bounds with no
clamp, so the batched cut-out never needs a row shift).

The window cut-out is BATCHED across the whole DMA group: one lane
gather over the (32*fetch, 128) scratch block aligns every track's
lanes at once (take_along_axis with per-row indices), and the row seam
is a static slice pair + select. A per-track scalar loop of dynamic
rolls measured ~85 ns/track of vector+issue time -- 3x the DMA cost;
the batched form is ~5 vreg ops per track (16384 tracks:
1.75 -> 0.55 ms/block on v5e).

Supported shapes: any bufferSize with max(128, S) a multiple of 128
and <= 2048 (sub-128 buffers ride the 128-wide cut and slice the
result), pool a multiple of 1024 samples, tracks a multiple of 32;
other shapes fall back to the XLA gather. The pool must carry
``POOL_PAD`` samples of tail slack past the last addressable window
(models/rndmem.py pads its device pool once at setup).

Output rows are (S_eff/128, 128) per track, reshaped to (T, S) outside
the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# DMAs started per grid step. The on-chip sweep (tools/rndmem_tune.py,
# docs/RESULTS_r4_rndmem_tune.md) measured 128x2 fastest at 16384
# tracks (0.856 ms/dispatch vs the old 32x2 default's 0.898, +4.7%),
# but adopting 128 flat regressed the 128-track suite row's device
# tier +22% (r3->r4 compare_runs): at t = tps the grid collapses to
# ONE step and the cross-step DMA lookahead -- the pipeline itself --
# disappears. The default is therefore adaptive: 128 where at least 8
# grid steps remain to pipeline across, else the r3-measured 32.
TRACKS_PER_STEP = 128
_SMALL_T_TPS = 32
_MIN_PIPELINE_STEPS = 8
POOL_PAD = 1024  # tail slack so base_row = ph//128 never clamps
MAX_S_EFF = 2048  # fetch*128 - s_eff <= POOL_PAD holds through here


def _rndmem_kernel(ph_ref, moff_ref, pool_ref, out_ref, scratch, sem,
                   *, out_rows: int, fetch_rows: int, tps: int,
                   n_slots: int):
    """Multi-buffered DMA pipeline: while this grid step's fetched
    windows are cut out, the next (n_slots - 1) steps' DMAs are already
    in flight into the other scratch slots -- the gather runs at DMA
    throughput instead of serialized DMA latency. tps DMAs start per
    step, so up to tps * (n_slots - 1) are outstanding while a step
    computes (default 32 x 1; the tuning sweep is
    tools/rndmem_tune.py)."""
    step = pl.program_id(0)
    n_steps = pl.num_programs(0)

    def dma_for(g, slot, j):
        # POOL_PAD guarantees base_row + fetch_rows stays in bounds; a
        # tail clamp would reintroduce a row offset (q > 0) the batched
        # lane-only cut-out below cannot express.
        base_row = ph_ref[g * tps + j] // 128
        return pltpu.make_async_copy(
            pool_ref.at[pl.ds(base_row, fetch_rows), :],
            scratch.at[slot, j],
            sem.at[slot, j],
        )

    # Prologue: fill slots 0..n_slots-2 with steps 0..n_slots-2 (the
    # n_slots=2 case degenerates to "start step 0").
    for k in range(n_slots - 1):
        @pl.when((step == 0) & (k < n_steps))
        def _(k=k):
            for j in range(tps):
                dma_for(k, k, j).start()

    # Steady state: while waiting on this step, keep the pipe
    # n_slots-1 steps ahead.
    la = step + n_slots - 1

    @pl.when(la < n_steps)
    def _():
        for j in range(tps):
            dma_for(la, la % n_slots, j).start()

    slot = step % n_slots
    for j in range(tps):
        dma_for(step, slot, j).wait()

    # Batched cut-out. moff is the per-track lane offset ph % 128,
    # broadcast to (tps, 128) host-side so it arrives lane-resident.
    moff = moff_ref[...]  # (tps, 128) int32, constant across lanes
    lane = jax.lax.broadcasted_iota(jnp.int32, (tps, 128), 1)
    idx = (moff + lane) & 127
    idx_rep = jnp.broadcast_to(
        idx[:, None, :], (tps, fetch_rows, 128)
    ).reshape(tps * fetch_rows, 128)
    g = jnp.take_along_axis(
        scratch[slot].reshape(tps * fetch_rows, 128),
        idx_rep, axis=1,
    ).reshape(tps, fetch_rows, 128)
    a = g[:, :out_rows, :]  # lanes < 128 - m: this row
    b = g[:, 1:out_rows + 1, :]  # lanes >= 128 - m: successor row
    seam = (lane < 128 - moff)[:, None, :]
    sel = jnp.where(seam, a, b)
    out_ref[...] = sel.reshape(tps * out_rows, 128)


@functools.partial(jax.jit, static_argnames=("logical_len",
                                              "tracks_per_step",
                                              "n_slots"))
def rndmem_gather_pallas(pool: jax.Array, playheads: jax.Array,
                         out_template: jax.Array, *,
                         logical_len: int | None = None,
                         tracks_per_step: int | None = None,
                         n_slots: int = 2):
    """Same contract as rndmem_gather: returns (S, T) interleaved.
    See the module docstring for the supported-shape envelope and the
    POOL_PAD requirement.

    ``tracks_per_step``/``n_slots`` shape the DMA pipeline (DMAs
    started per grid step / scratch buffers cycled); defaults are the
    shipped tuning, tools/rndmem_tune.py sweeps them on-chip.

    ``logical_len`` is the addressable pool length (samples) BEFORE the
    POOL_PAD tail slack was appended. A padded and an unpadded pool are
    indistinguishable by shape alone, so callers that know the logical
    length should pass it: the kernel then verifies at trace time that
    the physical buffer really carries the slack its tail-unclamped
    per-track DMAs rely on, instead of silently reading past the end of
    HBM for playheads near the pool tail."""
    t, s = out_template.shape
    if logical_len is not None and pool.shape[0] < logical_len + POOL_PAD:
        raise ValueError(
            f"rndmem_gather_pallas: pool has {pool.shape[0]} samples but "
            f"needs logical_len + POOL_PAD = {logical_len + POOL_PAD} "
            "(tail slack for unclamped per-track row DMAs); pad the pool "
            "with POOL_PAD zeros as models/rndmem.py does"
        )
    # Adaptive default: None = pick TRACKS_PER_STEP, dropping to the
    # small-t setting when the grid would be too short to pipeline.
    # Explicit values from callers/tuning sweeps are honored as-is
    # (ADVICE r4: an explicit 128 used to be indistinguishable from the
    # default and was silently remapped at small t, mislabeling sweep
    # points). Either way, clamped to the track count so small-t runs
    # stay on the Pallas path rather than falling back to XLA.
    if tracks_per_step is None:
        tps = TRACKS_PER_STEP
        if t < _MIN_PIPELINE_STEPS * tps:
            tps = _SMALL_T_TPS
    else:
        tps = tracks_per_step
    tps = min(tps, t)
    if n_slots < 2:
        raise ValueError("n_slots must be >= 2 (the wait slot plus at "
                         "least one in-flight slot)")
    s_eff = max(128, s)
    if (
        s_eff % 128 != 0
        or s_eff > MAX_S_EFF
        or pool.shape[0] % 1024 != 0
        or t % tps != 0
    ):
        from gpuaudiobench_tpu.ops.rndmem import rndmem_gather

        return rndmem_gather(pool, playheads, out_template)

    out_rows = s_eff // 128
    fetch_rows = -(-(out_rows + 1) // 8) * 8  # tile-rounded row cover

    pool2d = pool.reshape(-1, 128)
    moff = jnp.broadcast_to(
        (playheads % 128)[:, None], (t, 128)
    ).astype(jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t // tps,),
        in_specs=[
            pl.BlockSpec(
                (tps, 128), lambda i, *_: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # pool stays HBM
        ],
        out_specs=pl.BlockSpec(
            (tps * out_rows, 128), lambda i, *_: (i, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM(
                (n_slots, tps, fetch_rows, 128), jnp.float32
            ),
            pltpu.SemaphoreType.DMA((n_slots, tps)),
        ],
    )
    kernel = functools.partial(
        _rndmem_kernel, out_rows=out_rows, fetch_rows=fetch_rows,
        tps=tps, n_slots=n_slots,
    )
    rows = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t * out_rows, 128), jnp.float32),
    )(playheads, moff, pool2d)
    return rows.reshape(t, s_eff)[:, :s].T
