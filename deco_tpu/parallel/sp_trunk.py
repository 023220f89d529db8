"""Sequence-parallel trunk execution (context parallelism end-to-end).

Every op in a ``FlattenDiTBlock`` except attention is token-local (RMSNorm,
adaLN modulation, SwiGLU, residuals, RoPE given per-position tables), so the
whole trunk runs with activations SHARDED OVER THE SEQUENCE on the mesh's
``model`` axis: one ``shard_map`` wraps the scanned block stack, each device
holds (B_local, N/S, hidden), and only the attention inside each block talks
across devices — via :func:`parallel.ring_attention.ring_attention_local`
(``attn_impl="ring"``). The (N, N) score matrix and the full-length
activations never exist on any single device.

This is the scaling path the 1024px regime (4096 tokens — CLAUDE.md round-3)
needs beyond one chip; the reference has nothing comparable (SURVEY §5:
no SP/CP upstream, max 1024 tokens). Composes with the ``data`` axis for DP.

Per-block remat: each block application is wrapped in ``jax.checkpoint``
(matching the sequential trunk's training memory posture); pass
``remat=False`` for inference.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from deco_tpu.models import layers
from deco_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def sequence_parallel_trunk(
    stacked_params: Any,
    x: jax.Array,
    c: jax.Array,
    rope,
    *,
    mesh: Optional[jax.sharding.Mesh] = None,
    num_heads: int,
    mlp_ratio: float = 4.0,
    dtype: Any = jnp.bfloat16,
    remat: bool = True,
    seq_axis: str = MODEL_AXIS,
    batch_axis: str = DATA_AXIS,
):
    """Run the stacked DiT blocks with the sequence sharded over ``seq_axis``.

    ``stacked_params``: the ``blocks/block`` subtree (layer axis in dim 0,
    identical to the sequential ``run_dit_blocks`` tree). ``x``: (B, N, H)
    tokens (N divisible by the axis size), ``c``: (B, 1, H) conditioning,
    ``rope``: (cos, sin) tables of length N (sharded over ``seq_axis`` with
    the tokens). Returns (B, N, H) in the same layout as the sequential
    trunk.

    ``mesh=None`` uses the ambient mesh from an enclosing ``jax.set_mesh``
    context (the train/predict loops establish one) — this is how the
    model-level ``DeCoC2I(trunk_parallel="sp")`` knob reaches the executor
    from inside a Flax ``__call__``.
    """
    block = layers.FlattenDiTBlock(
        num_heads=num_heads, mlp_ratio=mlp_ratio, dtype=dtype,
        attn_impl="ring",
    )

    def one(xx, p1, c_loc, rope_loc):
        return block.apply({"params": p1}, xx, c_loc, rope_loc, None)

    if remat:
        one = jax.checkpoint(one, prevent_cse=False)

    mesh_kw = {} if mesh is None else {"mesh": mesh}

    @partial(
        jax.shard_map,
        in_specs=(
            jax.tree.map(lambda _: P(), stacked_params),
            P(batch_axis, seq_axis, None),
            P(batch_axis, None, None),
            jax.tree.map(lambda _: P(seq_axis, None), rope),
        ),
        out_specs=P(batch_axis, seq_axis, None),
        check_vma=False,
        **mesh_kw,
    )
    def run(params, x_loc, c_loc, rope_loc):
        def body(xx, p1):
            return one(xx, p1, c_loc, rope_loc), None

        out, _ = jax.lax.scan(body, x_loc, params)
        return out

    return run(stacked_params, x, c, rope)


def sequence_parallel_joint_trunk(
    stacked_params: Any,
    x: jax.Array,
    y: jax.Array,
    c: jax.Array,
    rope,
    *,
    mesh: Optional[jax.sharding.Mesh] = None,
    num_heads: int,
    mlp_ratio: float = 4.0,
    dtype: Any = jnp.bfloat16,
    remat: bool = True,
    seq_axis: str = MODEL_AXIS,
    batch_axis: str = DATA_AXIS,
):
    """Sequence-parallel executor for the t2i JOINT-attention trunk.

    Same contract as :func:`sequence_parallel_trunk` but for stacked
    :class:`deco_tpu.models.layers.JointDiTBlock` params (the t2i encoder,
    reference ``src/models/transformer/dit_t2i_pixnerd.py:201-310``): IMAGE
    tokens ``x`` (B, N, H) are sharded over ``seq_axis`` and their KV rides
    the ring, while TEXT tokens ``y`` (B, M, H) are replicated on every
    device and seed each ring accumulator via the flash (o, lse) merge
    (``ring_attention_local(extra_kv=...)``) — the text sequence is short
    (≤128) so replicating its KV costs nothing, and no device ever holds the
    full image-image score matrix. ``rope`` covers the N image positions
    only (text KV is un-RoPE'd, matching the sequential block).
    """
    block = layers.JointDiTBlock(
        num_heads=num_heads, mlp_ratio=mlp_ratio, dtype=dtype,
        attn_impl="ring",
    )

    def one(xx, p1, y_loc, c_loc, rope_loc):
        return block.apply({"params": p1}, xx, y_loc, c_loc, rope_loc)

    if remat:
        one = jax.checkpoint(one, prevent_cse=False)

    mesh_kw = {} if mesh is None else {"mesh": mesh}

    @partial(
        jax.shard_map,
        in_specs=(
            jax.tree.map(lambda _: P(), stacked_params),
            P(batch_axis, seq_axis, None),
            P(batch_axis, None, None),
            P(batch_axis, None, None),
            jax.tree.map(lambda _: P(seq_axis, None), rope),
        ),
        out_specs=P(batch_axis, seq_axis, None),
        check_vma=False,
        **mesh_kw,
    )
    def run(params, x_loc, y_loc, c_loc, rope_loc):
        def body(xx, p1):
            return one(xx, p1, y_loc, c_loc, rope_loc), None

        out, _ = jax.lax.scan(body, x_loc, params)
        return out

    return run(stacked_params, x, y, c, rope)
