"""Tensor-parallel trunk execution (Megatron-style, explicit collectives).

Completes the parallelism menu (DP + fsdp + PP + SP/ring): the DiT block's
two big matmul chains split over the mesh's ``model`` axis WITHOUT changing
the checkpoint layout — the executor reshapes the fused qkv kernel
``(c, 3c) -> (c, 3, H, hd)`` and the out-projection ``(c, c) -> (H, hd, c)``
to expose the head axis, shards heads / MLP width via ``shard_map`` in_specs,
and inserts the two canonical ``psum`` all-reduces per block (after the
attention out-projection and after the SwiGLU down-projection). Activations
stay replicated across the tp group; small ops (adaLN modulation, RMSNorm,
residuals) are computed redundantly per device — the Megatron trade.

Param tree is the SAME stacked ``blocks/block`` subtree the sequential scan
and the pipeline/SP executors use; the block math below mirrors
``layers.FlattenDiTBlock`` / ``layers.JointDiTBlock`` exactly
(equality-tested, fwd + grad).

When to use which (PARITY §2.10): fsdp for parameter capacity, SP/ring for
sequence length, PP for depth; TP trades two all-reduces per block for
per-device matmul width — on ICI it is the right axis when batch*seq is too
small to saturate the MXU per device but heads are plentiful.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from deco_tpu.models.layers import apply_rope, modulate
from deco_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, ambient_mesh


def _rmsnorm(x, weight, eps=1e-6):
    """layers.RMSNorm semantics: fp32 internals, input-dtype output."""
    dt = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf ** 2, axis=-1, keepdims=True)
    return (weight * (xf * jax.lax.rsqrt(var + eps))).astype(dt)


def _check_divisible(S, num_heads, m):
    if num_heads % S or m % S:
        raise ValueError(
            f"tensor parallelism over {S} devices needs heads ({num_heads}) "
            f"and SwiGLU width ({m}) divisible by the axis size"
        )


def _shared_arrs_specs(p, tp_axis):
    """The per-block params (and shard specs) common to FlattenDiTBlock and
    JointDiTBlock: norms, adaLN, attention out-projection (head-sharded),
    SwiGLU width-sharded kernels."""
    L = p["norm1"]["weight"].shape[0]
    hidden = p["adaLN_modulation"]["kernel"].shape[1]
    arrs = {
        "proj_b": p["attn"]["proj"]["bias"],
        "qn_w": p["attn"]["q_norm"]["weight"],
        "kn_w": p["attn"]["k_norm"]["weight"],
        "n1_w": p["norm1"]["weight"],
        "n2_w": p["norm2"]["weight"],
        "ada_k": p["adaLN_modulation"]["kernel"],
        "ada_b": p["adaLN_modulation"]["bias"],
        "w1_k": p["mlp"]["w1"]["kernel"],
        "w3_k": p["mlp"]["w3"]["kernel"],
        "w2_k": p["mlp"]["w2"]["kernel"],
    }
    specs = {
        "proj_b": P(),
        "qn_w": P(), "kn_w": P(), "n1_w": P(), "n2_w": P(),
        "ada_k": P(), "ada_b": P(),
        "w1_k": P(None, None, tp_axis),
        "w3_k": P(None, None, tp_axis),
        "w2_k": P(None, tp_axis, None),
    }
    return arrs, specs, L, hidden


def _adaln_split(q, c_loc, dt):
    mod = (c_loc.astype(dt) @ q["ada_k"].astype(dt)) + q["ada_b"].astype(dt)
    return jnp.split(mod, 6, axis=-1)


def _attn_core(qh, kh, vh, q, hd, dt, tp_axis):
    """fp32-softmax attention over the LOCAL head subset, out-projection
    partial matmul + the canonical psum, + bias (added once, post-psum)."""
    scale = 1.0 / (hd ** 0.5)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(dt)
    attn = jnp.einsum("bhqk,bkhd->bqhd", probs, vh)
    part = jnp.einsum("bnhd,hdc->bnc", attn.astype(dt),
                      q["proj_k"].astype(dt))
    return jax.lax.psum(part, tp_axis) + q["proj_b"].astype(dt)


def _swiglu_psum(q, h2, dt, tp_axis):
    """Width-sharded SwiGLU + the canonical down-projection psum."""
    a = h2.astype(dt) @ q["w1_k"].astype(dt)
    b3 = h2.astype(dt) @ q["w3_k"].astype(dt)
    part = (jax.nn.silu(a) * b3) @ q["w2_k"].astype(dt)
    return jax.lax.psum(part, tp_axis)


def _run_tp(arrs, specs, block, x, bcast, rope, *, mesh, remat, tp_axis,
            batch_axis):
    """Shared scaffolding: remat wrap + shard_map + layer scan.

    ``bcast``: tuple of (B, ·, hidden) arrays replicated over ``tp_axis``
    and batch-sharded over ``batch_axis`` (c for the c2i block; (y, c) for
    the joint block). ``block(xx, q, *bcast, rope)`` is the per-layer body.
    """
    if remat:
        block = jax.checkpoint(block, prevent_cse=False)
    mesh_kw = {} if mesh is None else {"mesh": mesh}

    @partial(
        jax.shard_map,
        **mesh_kw,
        in_specs=(
            {k: specs[k] for k in arrs},
            P(batch_axis, None, None),
            tuple(P(batch_axis, None, None) for _ in bcast),
            jax.tree.map(lambda _: P(), rope),
        ),
        out_specs=P(batch_axis, None, None),
        check_vma=False,
    )
    def run(q_local, x_loc, bcast_loc, rope_loc):
        def body(xx, q1):
            return block(xx, q1, *bcast_loc, rope_loc), None

        out, _ = jax.lax.scan(body, x_loc, q_local)
        return out

    return run(arrs, x, tuple(bcast), rope)


def tensor_parallel_trunk(
    stacked_params: Any,
    x: jax.Array,
    c: jax.Array,
    rope,
    *,
    mesh=None,
    num_heads: int,
    dtype: Any = jnp.bfloat16,
    remat: bool = True,
    tp_axis: str = MODEL_AXIS,
    batch_axis: str = DATA_AXIS,
):
    """Run the stacked DiT blocks tensor-parallel over ``tp_axis``.

    ``stacked_params``: the ``blocks/block`` subtree (layer axis leading).
    ``x``: (B, N, hidden); ``c``: (B, 1, hidden); ``rope``: (cos, sin).
    Heads and the SwiGLU width must divide the axis size. Returns (B, N,
    hidden), replicated over ``tp_axis``, batch over ``batch_axis``.
    ``mesh=None`` resolves the ambient ``jax.set_mesh`` mesh (the
    ``DeCoC2I(trunk_parallel="tp")`` path).
    """
    S = (ambient_mesh() if mesh is None else mesh).shape[tp_axis]
    p = stacked_params
    arrs, specs, L, hidden = _shared_arrs_specs(p, tp_axis)
    hd = hidden // num_heads
    _check_divisible(S, num_heads, p["mlp"]["w1"]["kernel"].shape[-1])

    # expose the shardable axes without touching the checkpoint layout
    arrs["qkv_k"] = p["attn"]["qkv"]["kernel"].reshape(
        L, hidden, 3, num_heads, hd)
    arrs["proj_k"] = p["attn"]["proj"]["kernel"].reshape(
        L, num_heads, hd, hidden)
    specs["qkv_k"] = P(None, None, None, tp_axis, None)
    specs["proj_k"] = P(None, tp_axis, None, None)

    def block(xx, q, c_loc, rope_loc):
        dt = dtype
        (sh_msa, sc_msa, g_msa, sh_mlp, sc_mlp, g_mlp) = _adaln_split(
            q, c_loc, dt)

        # --- attention (local heads) ---
        h = modulate(_rmsnorm(xx, q["n1_w"]), sh_msa, sc_msa)
        qkv = jnp.einsum("bnc,cthd->bnthd", h.astype(dt),
                         q["qkv_k"].astype(dt))
        qh, kh, vh = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        qh = _rmsnorm(qh, q["qn_w"])
        kh = _rmsnorm(kh, q["kn_w"])
        qh, kh = apply_rope(qh, kh, rope_loc)
        xx = xx + g_msa * _attn_core(qh, kh, vh, q, hd, dt, tp_axis)

        # --- SwiGLU (local width) ---
        h2 = modulate(_rmsnorm(xx, q["n2_w"]), sh_mlp, sc_mlp)
        return xx + g_mlp * _swiglu_psum(q, h2, dt, tp_axis)

    return _run_tp(arrs, specs, block, x, (c,), rope, mesh=mesh,
                   remat=remat, tp_axis=tp_axis, batch_axis=batch_axis)


def tensor_parallel_joint_trunk(
    stacked_params: Any,
    x: jax.Array,
    y: jax.Array,
    c: jax.Array,
    rope,
    *,
    mesh=None,
    num_heads: int,
    dtype: Any = jnp.bfloat16,
    remat: bool = True,
    tp_axis: str = MODEL_AXIS,
    batch_axis: str = DATA_AXIS,
):
    """Tensor-parallel executor for the t2i JOINT-attention trunk.

    Megatron split of :class:`deco_tpu.models.layers.JointDiTBlock` (the t2i
    encoder, reference ``dit_t2i_pixnerd.py:66-85``): heads shard over
    ``tp_axis`` for BOTH the image qkv (``(c,3c)->(c,3,H,hd)``) and the text
    kv (``(c,2c)->(c,2,H,hd)``) projections — each device attends its head
    subset over the full concat(image, text) keys locally, so the joint
    attention needs no extra collective beyond the canonical post-projection
    ``psum``; the exact-width SwiGLU shards its hidden dim. ``x``: image
    tokens (B, N, hidden), replicated over ``tp_axis``; ``y``: text tokens
    (B, M, hidden); ``rope`` covers image positions only. Checkpoint layout
    untouched (same stacked ``blocks/block`` subtree as the sequential scan).
    """
    S = (ambient_mesh() if mesh is None else mesh).shape[tp_axis]
    p = stacked_params
    arrs, specs, L, hidden = _shared_arrs_specs(p, tp_axis)
    hd = hidden // num_heads
    _check_divisible(S, num_heads, p["mlp"]["w1"]["kernel"].shape[-1])

    arrs["qkvx_k"] = p["attn"]["qkv_x"]["kernel"].reshape(
        L, hidden, 3, num_heads, hd)
    arrs["kvy_k"] = p["attn"]["kv_y"]["kernel"].reshape(
        L, hidden, 2, num_heads, hd)
    arrs["proj_k"] = p["attn"]["proj"]["kernel"].reshape(
        L, num_heads, hd, hidden)
    specs["qkvx_k"] = P(None, None, None, tp_axis, None)
    specs["kvy_k"] = P(None, None, None, tp_axis, None)
    specs["proj_k"] = P(None, tp_axis, None, None)

    def block(xx, q, y_loc, c_loc, rope_loc):
        dt = dtype
        (sh_msa, sc_msa, g_msa, sh_mlp, sc_mlp, g_mlp) = _adaln_split(
            q, c_loc, dt)

        # --- joint attention (local head subset, full concat keys) ---
        h = modulate(_rmsnorm(xx, q["n1_w"]), sh_msa, sc_msa)
        qkv = jnp.einsum("bnc,cthd->bnthd", h.astype(dt),
                         q["qkvx_k"].astype(dt))
        qh, kx, vx = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        qh = _rmsnorm(qh, q["qn_w"])
        kx = _rmsnorm(kx, q["kn_w"])
        qh, kx = apply_rope(qh, kx, rope_loc)
        kvy = jnp.einsum("bmc,cthd->bmthd", y_loc.astype(dt),
                         q["kvy_k"].astype(dt))
        ky, vy = kvy[:, :, 0], kvy[:, :, 1]
        ky = _rmsnorm(ky, q["kn_w"])  # shared k-RMSNorm, as in the Flax block
        kh = jnp.concatenate([kx, ky], axis=1)
        vh = jnp.concatenate([vx, vy], axis=1)
        xx = xx + g_msa * _attn_core(qh, kh, vh, q, hd, dt, tp_axis)

        # --- SwiGLU (local width) ---
        h2 = modulate(_rmsnorm(xx, q["n2_w"]), sh_mlp, sc_mlp)
        return xx + g_mlp * _swiglu_psum(q, h2, dt, tp_axis)

    return _run_tp(arrs, specs, block, x, (y, c), rope, mesh=mesh,
                   remat=remat, tp_axis=tp_axis, batch_axis=batch_axis)
