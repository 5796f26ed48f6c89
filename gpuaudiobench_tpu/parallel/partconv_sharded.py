"""Partition-sharded streaming convolution: the reverb tail distributed
over a mesh axis.

The single-chip PartConv block (ops/partconv.py) holds all P = ceil(L/B)
IR partitions and the frequency-domain delay line on one chip; HBM
traffic over FDL + H is its wall (docs/BENCHMARKS.md "PartConv"). This
variant shards the PARTITION axis over a mesh axis: each rank owns
P/n consecutive partitions of both H and the FDL, so per block

* every rank computes the forward spectrum of the (replicated) input
  block locally -- no communication;
* the delay line's global one-slot shift becomes ONE spectrum handoff
  between neighboring ranks (``ppermute`` of (T, B+1) re/im per rank:
  the spectrum leaving rank r's last slot enters rank r+1's first;
  rank 0 takes the fresh input spectrum, the last rank's oldest
  spectrum falls off the end of the IR);
* each rank multiply-accumulates its partial Y over its local
  partitions, and one ``psum`` over the axis yields the full spectrum,
  inverse-transformed redundantly on every rank.

Per block, per rank, the wire cost is 2*(T*(B+1)) floats ppermute +
2*(T*(B+1)) floats psum -- independent of P -- while the HBM wall
(the P-proportional FDL/H read) divides by the axis size: the scaling
path for reverbs whose tails exceed one chip's bandwidth budget.

Sharding the partition axis requires the SHIFT delay-line form (the
ring form's rotating head would make slot ownership rank-dependent);
the handoff ppermute replaces the intra-chip traffic the shift costs
on one device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def make_partconv_sharded_block(mesh: Mesh, partitions: int,
                                axis: str = "tp"):
    """Returns jitted fn(x, prev, fdl_re, fdl_im, h_re, h_im) ->
    (y, fdl_re', fdl_im') with the partition axis of the (T, P, B+1)
    arrays sharded over ``axis``; x/prev/y replicated.

    Call with GLOBAL arrays shaped exactly like the single-device
    ops.partconv.partconv_block operands; equivalence against it is
    test-pinned (tests/test_multichip.py).
    """
    nshards = mesh.shape[axis]
    if partitions % nshards != 0:
        raise ValueError(
            f"partitions ({partitions}) not divisible by mesh axis "
            f"{axis!r} ({nshards})")
    fwd_perm = [(i, i + 1) for i in range(nshards - 1)]

    def local_block(x, prev, fdl_re, fdl_im, h_re, h_im):
        b = x.shape[1]
        seg = jnp.concatenate([prev, x], axis=1)
        spec = jnp.fft.rfft(seg, axis=1)
        sre = spec.real.astype(jnp.float32)
        sim = spec.imag.astype(jnp.float32)

        # The spectrum entering this rank's first slot: the previous
        # rank's last slot (one-hop ppermute; rank 0 receives zeros
        # from the open chain) or, on rank 0, the fresh spectrum.
        in_re = jax.lax.ppermute(fdl_re[:, -1], axis, fwd_perm)
        in_im = jax.lax.ppermute(fdl_im[:, -1], axis, fwd_perm)
        first = jax.lax.axis_index(axis) == 0
        in_re = jnp.where(first, sre, in_re)
        in_im = jnp.where(first, sim, in_im)
        fdl_re = jnp.concatenate([in_re[:, None], fdl_re[:, :-1]], axis=1)
        fdl_im = jnp.concatenate([in_im[:, None], fdl_im[:, :-1]], axis=1)

        y_re = jax.lax.psum(
            jnp.sum(fdl_re * h_re - fdl_im * h_im, axis=1), axis)
        y_im = jax.lax.psum(
            jnp.sum(fdl_re * h_im + fdl_im * h_re, axis=1), axis)
        y = jnp.fft.irfft(jax.lax.complex(y_re, y_im), 2 * b, axis=1)
        return y[:, b:].astype(jnp.float32), fdl_re, fdl_im

    rep = P()
    part = P(None, axis, None)  # (T, P, bins): shard the partition axis
    fn = shard_map(
        local_block, mesh=mesh,
        in_specs=(rep, rep, part, part, part, part),
        out_specs=(rep, part, part),
        check_vma=False,
    )
    return jax.jit(fn)
