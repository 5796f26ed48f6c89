"""Overlapped-infeed measurement: double-buffer host->HBM uploads
against device compute.

SURVEY.md §2.4 maps the reference's pipeline-parallel axis onto
"double-buffered infeed (overlap host transfer with compute)", and the
reference's poster names pipelining as the mitigation a developer
would add to a transfer-dominated deployment
(/root/reference/media/dafx24/index.html:328-331). Every other tier in
this harness is either fully serial (the round-trip iteration:
upload -> compute -> read, synchronized per block) or fully on-device
(the saturated scan: no per-block host traffic at all). The
steady-state a real DAW deployment runs -- upload block k+1 WHILE
block k computes -- sits between them and is what this module
measures (VERDICT r3 missing #2).

Mechanics: JAX dispatch is asynchronous, so pipelining needs no
threads -- the host enqueues ``compute(block k)`` then immediately
enqueues ``device_put(block k+1)``; the runtime is free to run the
DMA and the kernel concurrently. The loop holds TWO live device input
slots (the one computing and the one filling: classic double
buffering) and synchronizes ONCE at the end on the last block's probe
-- legal because a single TPU executes dispatches in program order,
so the last compute finishing implies every predecessor finished.

The serial twin runs the same loop with a per-block probe sync, which
forces upload(k+1) to wait for compute(k). On a co-located host the
sync costs ~launch overhead; on a relay rig it pays the RPC floor per
block, which the report discloses via timing_environment rather than
hides (the overlapped number's single sync amortizes that floor away,
exactly like the saturated tier's).

State: stateful benchmarks carry their device-resident state through
the loop (block k+1's filter memory depends on block k -- the true
streaming dependency structure); only the INPUT upload is pipelined,
which is the point.
"""

from __future__ import annotations

import time
from typing import Callable, List, Tuple


def _probe_slice(y):
    """1-element completion token for a block output (pytree-safe)."""
    import jax

    return jax.tree_util.tree_leaves(y)[0].ravel()[:1]


def measure_overlap(
    step_fn: Callable,
    host_blocks,
    carry,
    depth: int,
    reps: int = 5,
) -> Tuple[List[float], List[float]]:
    """(serial_ms, overlapped_ms) per-block wall latencies.

    ``step_fn(x_dev, carry) -> (y, carry')`` runs ONE block of device
    compute on an uploaded input block (jitted by the caller);
    ``host_blocks`` is a sequence of >= 2 DISTINCT host payload arrays
    cycled across blocks (with a single repeated buffer the per-block
    upload can be runtime-dedupable, silently inflating the overlapped
    speedup -- enforced here rather than trusted to each overlap_body,
    ADVICE r4); ``carry`` is the initial device-resident state pytree
    (an empty tuple for stateless blocks).
    """
    import numpy as np

    from gpuaudiobench_tpu.utils import device as dev

    host_blocks = list(host_blocks)
    nh = len(host_blocks)
    if nh < 2:
        raise ValueError(
            "measure_overlap needs >= 2 distinct host blocks (a single "
            "repeated buffer makes the upload dedupable; see "
            "base.Benchmark.overlap_body)"
        )

    # Warm/compile outside any timing.
    c = carry
    xd = dev.to_device(host_blocks[0])
    y, c = step_fn(xd, c)
    _ = np.asarray(_probe_slice(y))

    serial: List[float] = []
    overlapped: List[float] = []
    for _ in range(max(1, reps)):
        # Serial: upload(k) -> compute(k) -> sync, then upload(k+1).
        t0 = time.perf_counter()
        for k in range(depth):
            xd = dev.to_device(host_blocks[k % nh])
            y, c = step_fn(xd, c)
            np.asarray(_probe_slice(y))
        serial.append((time.perf_counter() - t0) / depth * 1000.0)

        # Overlapped: enqueue compute(k), then upload(k+1) while it
        # runs; one sync at the end covers the whole pipeline.
        t0 = time.perf_counter()
        xd = dev.to_device(host_blocks[0])
        last = None
        for k in range(depth):
            y, c = step_fn(xd, c)
            if k + 1 < depth:
                xd = dev.to_device(host_blocks[(k + 1) % nh])
            last = y
        np.asarray(_probe_slice(last))
        overlapped.append((time.perf_counter() - t0) / depth * 1000.0)
    return serial, overlapped


def measure_overlap_batched(
    step_fn: Callable,
    host_blocks,
    carry,
    depth: int,
    batch: int,
    reps: int = 5,
) -> List[float]:
    """Overlapped steady state with ``batch`` blocks per upload RPC.

    On a relay rig the overlapped tier's residual per-block cost is
    dominated by the per-``device_put`` dispatch (an RPC each), not by
    the bytes (VERDICT r4 next #5 -- the buffer-64 campaign's
    1.6-2.2 ms floor). This variant stacks ``batch`` host blocks into
    one (batch, ...) array, uploads it ONCE, and slices block k on
    device -- cutting upload dispatches per block by ``batch`` while
    compute still runs one block at a time (the real-time structure:
    block k's output is still produced before block k+batch arrives).
    Latency note: batching uploads adds ``batch`` blocks of input
    buffering at the producer -- it trades deadline-floor throughput
    for added input latency, which the report must say.

    Returns per-block wall latencies (ms), one per rep; same
    depth-amortized semantics as ``measure_overlap``'s overlapped list.
    """
    import numpy as np

    from gpuaudiobench_tpu.utils import device as dev

    host_blocks = list(host_blocks)
    if len(host_blocks) < 2:
        raise ValueError("measure_overlap_batched needs >= 2 distinct "
                         "host blocks")
    if depth % batch != 0:
        raise ValueError(f"depth ({depth}) must be a multiple of "
                         f"batch ({batch})")
    # Two distinct stacked groups cycled across uploads (the >=2
    # distinct buffers rule, applied at the group level).
    nh = len(host_blocks)
    groups = []
    for g in range(2):
        stack = np.stack([
            np.asarray(host_blocks[(g * batch + i) % nh])
            for i in range(batch)
        ])
        groups.append(stack)

    import jax

    slice_fn = jax.jit(lambda b, i: b[i])

    # Warm/compile outside timing.
    c = carry
    bd = dev.to_device(groups[0])
    y, c = step_fn(slice_fn(bd, 0), c)
    _ = np.asarray(_probe_slice(y))

    out: List[float] = []
    for _ in range(max(1, reps)):
        t0 = time.perf_counter()
        bd_cur = dev.to_device(groups[0])
        bd_next = None
        last = None
        for k in range(depth):
            i = k % batch
            if i == 0 and k + batch < depth:
                # Enqueue the NEXT group's upload at the START of this
                # group: batch-1 blocks of compute overlap it (enqueued
                # at the end, only one block would).
                bd_next = dev.to_device(groups[((k // batch) + 1) % 2])
            y, c = step_fn(slice_fn(bd_cur, i), c)
            if i == batch - 1 and bd_next is not None:
                bd_cur = bd_next
            last = y
        np.asarray(_probe_slice(last))
        out.append((time.perf_counter() - t0) / depth * 1000.0)
    return out
