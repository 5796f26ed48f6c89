"""Channel-sharded (tensor-parallel) NeuralAmp: the TCN's channel axis
distributed over a mesh axis.

The single-chip NeuralAmp block (ops/neuralamp.py) holds all C channels
of every tap matrix and activation on one chip; its walls are MXU FLOPs
(f32) or activation HBM traffic (bf16) -- docs/BENCHMARKS.md. This
variant is the Megatron column-parallel pattern applied to the dilated
conv stack: each rank owns C/n output channels of every tap matrix (and
the matching slice of every activation/tail), so per layer

* each rank all-gathers the layer input's channel shards to the full
  (T, S+ctx, C) activation (the contraction needs every input channel);
* contracts it against its LOCAL (K, C, C/n) column shard -- 1/n of
  the layer's MACs -- and applies tanh + residual locally;
* the output 1x1 conv is a row-parallel contraction finished by one
  ``psum``.

Per layer per rank the wire cost is one all_gather of (T, (S+ctx), C)
floats; weights and carried tails never move. Activations dominate the
wire only when C is small relative to K*C^2/n MACs -- at the default
C=128, L=10 the FLOP:gathered-byte ratio is ~2*K*C/(4n) = 192/n
FLOP/B, comfortably above the v5e ICI roofline crossover
(parallel/ici_model.py quantifies per-shape).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from gpuaudiobench_tpu.ops.neuralamp import KERNEL


def make_neuralamp_tp_block(mesh: Mesh, layers: int, axis: str = "tp"):
    """Returns jitted fn(x, tails, params) -> (y, tails') with the
    channel axis of every tap matrix, bias, and carried tail sharded
    over ``axis``; x and y replicated.

    Call with GLOBAL arrays shaped exactly like the single-device
    ops.neuralamp.tcn_block operands (f32 params from cast_params);
    equivalence against it is test-pinned (tests/test_neuralamp.py).
    """

    def local_block(x, tails, params):
        b = x.shape[1]
        hi = jax.lax.Precision.HIGHEST
        # Input 1x1 conv: w_in is channel-sharded, so h is born local.
        h = jnp.tanh(x[..., None] * params["w_in"] + params["b_in"])
        new_tails = []
        for l in range(layers):
            d = 1 << l
            ctx = (KERNEL - 1) * d
            ext = jnp.concatenate([tails[l], h], axis=1)
            new_tails.append(ext[:, -ctx:])
            # Contraction needs every input channel: gather the shards.
            full = jax.lax.all_gather(ext, axis, axis=2, tiled=True)
            acc = params[f"b{l}"]
            for j in range(KERNEL):
                acc = acc + jnp.einsum(
                    "tsc,cd->tsd", full[:, j * d:j * d + b],
                    params[f"w{l}"][j], precision=hi,
                    preferred_element_type=jnp.float32)
            h = h + jnp.tanh(acc)
        # Output 1x1 conv: row-parallel (w_out sharded on the
        # contraction axis), finished by one psum.
        y = jax.lax.psum(
            jnp.einsum("tsc,c->ts", h, params["w_out"], precision=hi,
                       preferred_element_type=jnp.float32), axis)
        return y + params["b_out"], tuple(new_tails)

    rep = P()
    chan = P(None, None, axis)  # (T, ctx, C): shard channels
    param_specs = {"w_in": P(axis), "b_in": P(axis),
                   "w_out": P(axis), "b_out": rep}
    for l in range(layers):
        param_specs[f"w{l}"] = P(None, None, axis)  # (K, C, C/n) columns
        param_specs[f"b{l}"] = P(axis)
    fn = shard_map(
        local_block, mesh=mesh,
        in_specs=(rep, tuple(chan for _ in range(layers)), param_specs),
        out_specs=(rep, tuple(chan for _ in range(layers))),
        check_vma=False,
    )
    return jax.jit(fn)
