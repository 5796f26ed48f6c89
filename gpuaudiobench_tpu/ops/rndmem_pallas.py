"""Pallas TPU kernel for the random-memory (granular) gather.

The XLA path (ops/rndmem.py) lowers the per-track dynamic slices to a
gather; this kernel expresses the access pattern the benchmark is
*about* natively: the 512 MiB sample pool stays in HBM (never blocked
into VMEM), per-track playheads arrive as scalar-prefetch operands, and
each track's window is fetched with its own async DMA HBM->VMEM -- the
TPU analog of the CUDA kernel's non-coalesced per-track copies
(bench_rndmem.cu:7-20).

HBM DMA slices must respect the (8, 128) tile: the pool is viewed as
(P/128, 128) rows and each track fetches the 16 aligned rows (2048
samples, 8 KiB) that cover its unaligned 512-sample window -- the TPU's
minimum-scatter granularity, the honest analog of GPU cacheline
overfetch. The window is then cut out in VMEM with dynamic rolls:
for offset q*128 + m, roll rows by -q, roll lanes by -m, and select
between the row and its successor at the lane seam.

Output rows are (4, 128) per track, reshaped to (T, 512) outside the
kernel. Buffer size must be 512 and the pool a multiple of 1024; other
shapes fall back to the XLA gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FETCH_ROWS = 16  # 16 x 128 = 2048 samples >= any 512 window in a 1024-block
OUT_ROWS = 4  # 4 x 128 = 512 samples per track
TRACKS_PER_STEP = 16  # DMAs in flight per grid step


def _rndmem_kernel(ph_ref, pool_ref, out_ref, scratch, sem):
    """Double-buffered DMA pipeline: while this grid step's fetched
    windows are cut out with roll-selects, the NEXT step's 16 DMAs are
    already in flight into the other scratch slot -- the gather runs at
    DMA throughput instead of serialized DMA latency (9.9 -> ~2 ms at
    65536 tracks)."""
    step = pl.program_id(0)
    n_steps = pl.num_programs(0)
    total_rows = pool_ref.shape[0]

    def dma_for(g, slot, j):
        ph = ph_ref[g * TRACKS_PER_STEP + j]
        base_row = jnp.minimum((ph // 1024) * 8, total_rows - FETCH_ROWS)
        return base_row, pltpu.make_async_copy(
            pool_ref.at[pl.ds(base_row, FETCH_ROWS), :],
            scratch.at[slot, j],
            sem.at[slot, j],
        )

    @pl.when(step == 0)
    def _():
        for j in range(TRACKS_PER_STEP):
            dma_for(0, 0, j)[1].start()

    @pl.when(step + 1 < n_steps)
    def _():
        nxt = (step + 1) % 2
        for j in range(TRACKS_PER_STEP):
            dma_for(step + 1, nxt, j)[1].start()

    slot = step % 2
    lane = jax.lax.broadcasted_iota(jnp.int32, (OUT_ROWS + 1, 128), 1)
    for j in range(TRACKS_PER_STEP):
        base_row, dma = dma_for(step, slot, j)
        dma.wait()
        ph = ph_ref[step * TRACKS_PER_STEP + j]
        off = ph - base_row * 128
        q = off // 128
        m = off % 128
        # Align the window to row 0 (dynamic sublane roll -- Mosaic has
        # no dynamic_slice) and cut to OUT_ROWS+1 rows, so the lane
        # alignment below touches 5 rows instead of 16.
        xq = pltpu.roll(scratch[slot, j], (FETCH_ROWS - q) % FETCH_ROWS, 0)
        win = xq[:OUT_ROWS + 1, :]
        # pltpu.roll takes non-negative shifts: left-roll k == (N-k) % N.
        lshift = (128 - m) % 128
        a = pltpu.roll(win, lshift, 1)  # within-row lane shift
        b = pltpu.roll(pltpu.roll(win, OUT_ROWS, 0), lshift, 1)  # next row
        sel = jnp.where(lane < 128 - m, a, b)
        out_ref[j * OUT_ROWS:(j + 1) * OUT_ROWS, :] = sel[:OUT_ROWS, :]


@jax.jit
def rndmem_gather_pallas(pool: jax.Array, playheads: jax.Array,
                         out_template: jax.Array):
    """Same contract as rndmem_gather: returns (S, T) interleaved."""
    t, s = out_template.shape
    if s != 512 or pool.shape[0] % 1024 != 0 or t % TRACKS_PER_STEP != 0:
        from gpuaudiobench_tpu.ops.rndmem import rndmem_gather

        return rndmem_gather(pool, playheads, out_template)

    pool2d = pool.reshape(-1, 128)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t // TRACKS_PER_STEP,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],  # pool stays HBM
        out_specs=pl.BlockSpec(
            (TRACKS_PER_STEP * OUT_ROWS, 128), lambda i, *_: (i, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, TRACKS_PER_STEP, FETCH_ROWS, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, TRACKS_PER_STEP)),
        ],
    )
    rows = pl.pallas_call(
        _rndmem_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t * OUT_ROWS, 128), jnp.float32),
    )(playheads, pool2d)
    return rows.reshape(t, s).T
