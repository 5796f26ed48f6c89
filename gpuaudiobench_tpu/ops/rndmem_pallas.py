"""Pallas TPU kernel for the random-memory (granular) gather.

The XLA path (ops/rndmem.py) lowers the per-track dynamic slices to a
gather; this kernel expresses the access pattern the benchmark is
*about* explicitly: the 512 MiB sample pool stays in HBM (never blocked
into VMEM), per-track playheads arrive as scalar-prefetch operands, and
each track's bufferSize window is fetched with a double-buffered async
DMA HBM->VMEM -- the TPU analog of the CUDA kernel's non-coalesced
per-track copies (bench_rndmem.cu:7-20).

Output is track-major here; the caller transposes to the reference's
interleaved layout (a fused XLA transpose on the way out).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TRACKS_PER_STEP = 8  # one sublane row of output per DMA wave


def _rndmem_kernel(ph_ref, pool_ref, out_ref, scratch, sems):
    """Grid step = TRACKS_PER_STEP tracks; fetch each track's window
    from HBM with its own DMA, then assemble the (8, S) output block."""
    step = pl.program_id(0)
    s = out_ref.shape[1]

    def start(i):
        ph = ph_ref[step * TRACKS_PER_STEP + i]
        return pltpu.make_async_copy(
            pool_ref.at[pl.ds(ph, s)],
            scratch.at[i],
            sems.at[i],
        )

    # Launch all TRACKS_PER_STEP fetches, then drain.
    for i in range(TRACKS_PER_STEP):
        start(i).start()
    for i in range(TRACKS_PER_STEP):
        start(i).wait()
        out_ref[i, :] = scratch[i]


@functools.partial(jax.jit, static_argnames=())
def rndmem_gather_pallas(pool: jax.Array, playheads: jax.Array,
                         out_template: jax.Array):
    """Same contract as rndmem_gather: returns (S, T) interleaved."""
    t, s = out_template.shape
    if t % TRACKS_PER_STEP != 0:
        from gpuaudiobench_tpu.ops.rndmem import rndmem_gather

        return rndmem_gather(pool, playheads, out_template)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t // TRACKS_PER_STEP,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],  # pool stays HBM
        out_specs=pl.BlockSpec(
            (TRACKS_PER_STEP, s), lambda i, *_: (i, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((TRACKS_PER_STEP, s), jnp.float32),
            pltpu.SemaphoreType.DMA((TRACKS_PER_STEP,)),
        ],
    )
    rows = pl.pallas_call(
        _rndmem_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t, s), jnp.float32),
    )(playheads, pool)
    return rows.T
