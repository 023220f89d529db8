"""Pipeline parallelism for the scanned DiT trunk.

GPipe-style pipelining expressed the TPU way (cf. the public scaling-book
recipe): the trunk's stacked per-layer parameters (the ``nn.scan`` layer axis)
are sharded over the mesh's ``model`` axis — each device (stage) holds a
contiguous slice of layers — and activations flow stage-to-stage over ICI via
``lax.ppermute`` inside a single ``shard_map``. The batch is split into
microbatches so stages overlap: at steady state every stage is busy on a
different microbatch, and the bubble is (S-1)/(M+S-1).

The reference is DP-only (SURVEY §2.10 — Lightning DDP; no TP/PP anywhere),
so this has no upstream counterpart; it is the scaling path for
deeper-than-HBM trunks. Composes with the ``data`` axis: each data-parallel
group runs its own pipeline over its ``model``-axis stages.

Design notes:
- One ``lax.scan`` over M+S-1 ticks; each tick applies the local layer slice
  (itself a ``lax.scan`` over local layers) and ppermutes the activation ring
  forward one stage. Static schedule, fully jit-compatible.
- Stage 0 feeds fresh microbatches for the first M ticks; the wrap-around
  activation it receives afterwards is discarded by the input mux.
- The last stage's outputs are collected in a buffer and broadcast to the
  whole ``model`` group with a masked ``psum`` at the end, so the result
  layout matches the non-pipelined trunk (replicated over ``model``, sharded
  over ``data``).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from deco_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def pipeline_apply(
    apply_layer: Callable,
    stacked_params: Any,
    x: jax.Array,
    mb_args: Sequence[jax.Array] = (),
    bcast_args: Sequence[Any] = (),
    *,
    mesh: jax.sharding.Mesh,
    num_microbatches: int,
    stage_axis: str = MODEL_AXIS,
    batch_axis: str = DATA_AXIS,
):
    """Run ``x`` through all stacked layers, pipelined over ``stage_axis``.

    ``apply_layer(layer_params, x, *mb, *bcast) -> x`` applies ONE layer
    (every leaf of ``layer_params`` has the layer axis stripped).
    ``stacked_params`` leaves carry the layer axis in dim 0; the layer count
    must divide the stage count. ``x`` and each of ``mb_args`` lead with the
    batch dim (microbatched together); ``bcast_args`` are passed through
    unchanged (e.g. RoPE tables).

    Returns the full-depth output with the same sharding contract as the
    sequential trunk: batch over ``data``, replicated over ``model``.
    """
    n_stages = mesh.shape[stage_axis]
    n_layers = jax.tree.leaves(stacked_params)[0].shape[0]
    assert n_layers % n_stages == 0, (n_layers, n_stages)
    batch = x.shape[0]
    # the reshape inside shard_map splits the PER-DEVICE batch into
    # microbatches, so that's the quantity that must divide
    local_batch = batch // mesh.shape[batch_axis]
    if batch % mesh.shape[batch_axis] or local_batch % num_microbatches:
        raise ValueError(
            f"batch {batch} over {mesh.shape[batch_axis]} data shards gives "
            f"{local_batch} per device, not divisible into "
            f"{num_microbatches} microbatches"
        )

    in_specs = (
        jax.tree.map(lambda _: P(stage_axis), stacked_params),
        P(batch_axis),
        jax.tree.map(lambda _: P(batch_axis), tuple(mb_args)),
        jax.tree.map(lambda _: P(), tuple(bcast_args)),
    )

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=P(batch_axis),
        check_vma=False,
    )
    def run(params_local, x_local, mb_local, bcast):
        S, M = n_stages, num_microbatches
        stage = jax.lax.axis_index(stage_axis)
        mb_size = x_local.shape[0] // M
        x_mb = x_local.reshape(M, mb_size, *x_local.shape[1:])
        mb_mb = tuple(a.reshape(M, mb_size, *a.shape[1:]) for a in mb_local)

        def apply_stage(carry_x, mb_extra):
            def one(xx, p1):
                return apply_layer(p1, xx, *mb_extra, *bcast), None

            out, _ = jax.lax.scan(one, carry_x, params_local)
            return out

        def tick(state, t):
            ring, out_buf = state
            # input mux: stage 0 takes microbatch t (clamped; unused ticks
            # recompute mb M-1 and are masked out), others take the ring
            mb_idx = jnp.clip(t, 0, M - 1)
            fresh = jax.lax.dynamic_index_in_dim(x_mb, mb_idx, 0, False)
            inp = jnp.where(stage == 0, fresh, ring)
            # per-microbatch extras must track the microbatch each stage is
            # working on: stage s at tick t holds microbatch t - s
            own_idx = jnp.clip(t - stage, 0, M - 1)
            extras = tuple(
                jax.lax.dynamic_index_in_dim(a, own_idx, 0, False)
                for a in mb_mb
            )
            out = apply_stage(inp, extras)
            # collect on the last stage: tick t finishes microbatch t-(S-1)
            slot = jnp.clip(t - (S - 1), 0, M - 1)
            take = (stage == S - 1) & (t >= S - 1)
            out_buf = jax.lax.dynamic_update_index_in_dim(
                out_buf,
                jnp.where(take, out, jax.lax.dynamic_index_in_dim(
                    out_buf, slot, 0, False)),
                slot, 0,
            )
            ring = jax.lax.ppermute(
                out, stage_axis, [(i, (i + 1) % S) for i in range(S)]
            )
            return (ring, out_buf), None

        ring0 = jnp.zeros_like(x_mb[0])
        out_buf0 = jnp.zeros_like(x_mb)
        (_, out_buf), _ = jax.lax.scan(
            tick, (ring0, out_buf0), jnp.arange(M + S - 1)
        )
        # broadcast the last stage's buffer to the whole stage group so the
        # output is replicated over `model`, like the sequential trunk
        out_buf = jax.lax.psum(
            jnp.where(stage == S - 1, out_buf, jnp.zeros_like(out_buf)),
            stage_axis,
        )
        return out_buf.reshape(batch // mesh.shape[batch_axis],
                               *x_local.shape[1:])

    return run(stacked_params, x, tuple(mb_args), tuple(bcast_args))


def dit_block_apply(block_module):
    """Adapter: one FlattenDiTBlock application for :func:`pipeline_apply`.

    ``block_module`` is an instantiated ``layers.FlattenDiTBlock``; returns
    ``apply_layer(p1, x, c, rope) -> x`` over unstacked per-layer params.
    """

    def apply_layer(p1, x, c, rope):
        return block_module.apply({"params": p1}, x, c, rope, None)

    return apply_layer
