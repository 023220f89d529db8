"""Ring attention: context parallelism for 1024px-class sequences.

The reference has no sequence/context parallelism (SURVEY §5 "long-context":
none exists; its longest shipped sequence is 1024 tokens). deco_tpu trains at
4096 tokens (1024px — CLAUDE.md round-3), where attention state per device
starts to matter: ring attention shards the SEQUENCE over the mesh's
``model`` axis so each device holds N/S tokens of q/k/v, and KV chunks rotate
around the ring via ``lax.ppermute`` over ICI while each device accumulates
its queries' attention online — the flash-attention merge rule
(o, logsumexp) applied across devices instead of across VMEM tiles.

Memory per device: O(N/S · D) activations and one in-flight KV chunk; the
full (N, N) score matrix never exists anywhere. Communication: S-1 ppermute
hops of the local KV chunk, overlappable with the chunk matmuls by XLA's
async collectives.

Correctness contract: bit-compatible with full softmax attention up to fp32
reduction order (tested vs ``layers.sdpa`` forward AND gradients on the
virtual CPU mesh). Autodiff works through the hop scan (the partial-attention
chunks are plain XLA ops; ``ppermute`` transposes to the reverse rotation).

On accelerators the per-chunk partial attention can dispatch to the Pallas
flash kernel (``ops.flash_attention._flash_fwd_lse`` — same (o, lse)
contract); the XLA chunk path is the portable default and the one the CPU
mesh tests pin down.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from deco_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

NEG_INF = -1e30


def _partial_attn_xla(q, k, v, scale):
    """Unmerged attention of q against ONE kv chunk.

    q: (B, Nq, H, D); k/v: (B, Nk, H, D). Returns (o, lse) with o normalized
    within the chunk and lse = log sum exp of the chunk's scaled logits,
    shape (B, H, Nq) — the flash-merge sufficient statistics.
    """
    s = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    m = jnp.max(s, axis=-1)
    p = jnp.exp(s - m[..., None])
    l = jnp.sum(p, axis=-1)
    o = jnp.einsum(
        "bhqk,bkhd->bqhd", (p / l[..., None]).astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return o.astype(q.dtype), m + jnp.log(l)


def _merge(o_a, lse_a, o_b, lse_b):
    """Combine two normalized partial attentions: o = Σ Z_i o_i / Σ Z_i."""
    m = jnp.maximum(lse_a, lse_b)
    w_a = jnp.exp(lse_a - m)
    w_b = jnp.exp(lse_b - m)
    denom = w_a + w_b
    w_a, w_b = w_a / denom, w_b / denom
    o = o_a * w_a.transpose(0, 2, 1)[..., None] \
        + o_b * w_b.transpose(0, 2, 1)[..., None]
    return o.astype(o_a.dtype), m + jnp.log(denom)


def ring_attention_local(
    q_loc, k_loc, v_loc,
    *,
    axis: str = MODEL_AXIS,
    axis_size: int,
    scale: Optional[float] = None,
    extra_kv=None,
):
    """The per-device ring body — call this INSIDE an enclosing ``shard_map``
    that binds ``axis`` (e.g. the sequence-parallel trunk executor). Local
    shapes (B, N/S, H, D); DiT attention is bidirectional (no causal mask),
    so every device attends its local queries to every rotating KV chunk —
    no hop masking needed.

    ``extra_kv``: optional (k, v) of REPLICATED tokens every query also
    attends to, outside the ring — the t2i joint-attention case, where text
    KV lives on every device while image KV rotates
    (:class:`deco_tpu.models.layers.JointAttention` with ``attn_impl="ring"``).
    The accumulator is seeded with the extra-KV partial and the hops merge
    into it via the (o, lse) rule."""
    if scale is None:
        scale = 1.0 / (q_loc.shape[-1] ** 0.5)
    b, nq, h, _ = q_loc.shape

    def hop(carry, _):
        k_cur, v_cur, o_acc, lse_acc = carry
        o_i, lse_i = _partial_attn_xla(q_loc, k_cur, v_cur, scale)
        o_acc, lse_acc = _merge(o_acc, lse_acc, o_i, lse_i)
        perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]
        k_nxt = jax.lax.ppermute(k_cur, axis, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis, perm)
        return (k_nxt, v_nxt, o_acc, lse_acc), None

    if extra_kv is not None:
        o0, lse0 = _partial_attn_xla(q_loc, extra_kv[0], extra_kv[1], scale)
    else:
        o0 = jnp.zeros_like(q_loc)
        lse0 = jnp.full((b, h, nq), NEG_INF, jnp.float32)
    (_, _, o, _), _ = jax.lax.scan(
        hop, (k_loc, v_loc, o0, lse0), None, length=axis_size
    )
    return o


def ring_attention(
    q, k, v,
    *,
    mesh: jax.sharding.Mesh,
    scale: Optional[float] = None,
    seq_axis: str = MODEL_AXIS,
    batch_axis: str = DATA_AXIS,
):
    """Full (non-causal) attention with q/k/v sequence-sharded over ``seq_axis``.

    Inputs are (B, N, H, D) global arrays; N must divide by the axis size.
    Returns (B, N, H, D) with the same sharding layout. This is the
    standalone-op entry; :func:`ring_attention_local` is the same body for
    callers already inside a ``shard_map`` (see ``parallel/sp_trunk.py``).
    """
    n_ring = mesh.shape[seq_axis]

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(batch_axis, seq_axis, None, None),
            P(batch_axis, seq_axis, None, None),
            P(batch_axis, seq_axis, None, None),
        ),
        out_specs=P(batch_axis, seq_axis, None, None),
        check_vma=False,
    )
    def run(q_loc, k_loc, v_loc):
        return ring_attention_local(
            q_loc, k_loc, v_loc, axis=seq_axis, axis_size=n_ring, scale=scale
        )

    return run(q, k, v)
