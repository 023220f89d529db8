"""Mixture-of-Experts SwiGLU MLP (GShard-style, fixed capacity).

Beyond the reference (hhhhzp/DeCo is dense-only): this module exists to
complete the parallelism menu with expert parallelism (EP —
:mod:`deco_tpu.parallel.ep_moe`) the way the other executors complete
TP/SP/PP. The design is TPU-first throughout:

- **Static shapes**: fixed per-(batch-row, expert) capacity; overflow tokens
  are dropped (their MLP contribution is zero — the residual stream carries
  them), never ragged.
- **Einsum dispatch/combine**: the (S, E, C) one-hot dispatch tensor turns
  routing into two batched matmuls on the MXU instead of gathers/scatters.
- **k-major assignment order** (GShard): all first choices across the row
  claim capacity slots before any second choice, position within a choice is
  token order — deterministic, and reproducible shard-by-shard so the EP
  executor can match it exactly with a capacity-offset ``all_gather``.

Router math runs in fp32 (softmax + top-k on bf16 logits loses routing
determinism across shardings); expert SwiGLU widths follow
:class:`deco_tpu.models.layers.SwiGLU` conventions.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


def topk_masks(probs: jax.Array, top_k: int) -> jax.Array:
    """Stacked one-hot choice masks, (K, ..., E) — k-th slice is the k-th
    choice of each token. Deterministic argmax tie-break (lowest index)."""
    masks = []
    p = probs
    for _ in range(top_k):
        idx = jnp.argmax(p, axis=-1)
        m = jax.nn.one_hot(idx, probs.shape[-1], dtype=probs.dtype)
        masks.append(m)
        p = p * (1.0 - m) - m  # never re-pick
    return jnp.stack(masks, axis=0)


def dispatch_tensors(probs: jax.Array, top_k: int, capacity: int,
                     position_offset: jax.Array | None = None):
    """Routing → (dispatch, combine, aux) for one batch row.

    ``probs``: (S, E) fp32 router probabilities. Returns ``dispatch``
    (S, E, C) {0,1}, ``combine`` (S, E, C) = dispatch * renormalized gate,
    and the load-balance aux loss scalar (Switch/GShard form:
    ``E * mean_e(frac_tokens_e * mean_prob_e)`` over first choices).

    ``position_offset``: (K, E) starting slot per (choice, expert) — the EP
    executor passes the count of slots claimed by earlier shards so a
    sequence-sharded computation reproduces the dense assignment exactly.
    """
    s, e = probs.shape
    masks = topk_masks(probs, top_k)  # (K, S, E)
    gates = jnp.sum(masks * probs[None], axis=-1)  # (K, S)
    denom = jnp.maximum(jnp.sum(gates, axis=0, keepdims=True), 1e-9)
    gates = gates / denom  # renormalize over the K choices

    # k-major position: all k=0 claims come first, then k=1, ...
    flat = masks.reshape(top_k * s, e)
    pos = jnp.cumsum(flat, axis=0) - flat  # exclusive, (K*S, E)
    pos = pos.reshape(top_k, s, e)
    if position_offset is not None:
        pos = pos + position_offset[:, None, :]
    slot = jnp.sum(pos * masks, axis=-1).astype(jnp.int32)  # (K, S)
    keep = (slot < capacity) & (jnp.sum(masks, axis=-1) > 0)

    oh = jax.nn.one_hot(slot, capacity, dtype=probs.dtype)  # (K, S, C)
    disp_k = masks[..., None] * oh[:, :, None, :] * keep[..., None, None]
    dispatch = jnp.sum(disp_k, axis=0)  # (S, E, C)
    combine = jnp.sum(disp_k * gates[..., None, None], axis=0)

    frac_assigned = jnp.mean(masks[0], axis=0)  # first-choice fraction, (E,)
    mean_prob = jnp.mean(probs, axis=0)
    aux = e * jnp.sum(frac_assigned * mean_prob)
    return dispatch, combine, aux


def expert_swiglu(p: Any, x: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """Per-expert SwiGLU on dispatched slots: x (E, C, d) with stacked
    kernels w1/w3 (E, d, m), w2 (E, m, d)."""
    xd = x.astype(dtype)
    a = jnp.einsum("ecd,edm->ecm", xd, p["w1"].astype(dtype))
    b = jnp.einsum("ecd,edm->ecm", xd, p["w3"].astype(dtype))
    return jnp.einsum("ecm,emd->ecd", jax.nn.silu(a) * b,
                      p["w2"].astype(dtype))


class MoEMLP(nn.Module):
    """Drop-in MoE replacement for the dense SwiGLU MLP.

    ``capacity_factor``: per-expert capacity = ceil(cf * S * top_k / E)
    slots per batch row. The aux load-balance loss is sown under
    ``("aux_loss", "moe")`` — readable via ``mutable=["aux_loss"]``.
    """

    num_experts: int
    mlp_dim: int
    top_k: int = 2
    capacity_factor: float = 1.25
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        b, s, d = x.shape
        e = self.num_experts
        cap = int(-(-self.capacity_factor * s * self.top_k // e))
        wg = self.param("router", nn.initializers.lecun_normal(), (d, e),
                        jnp.float32)
        w1 = self.param("w1", nn.initializers.lecun_normal(),
                        (e, d, self.mlp_dim), jnp.float32)
        w3 = self.param("w3", nn.initializers.lecun_normal(),
                        (e, d, self.mlp_dim), jnp.float32)
        w2 = self.param("w2", nn.initializers.lecun_normal(),
                        (e, self.mlp_dim, d), jnp.float32)

        probs = jax.nn.softmax(
            x.astype(jnp.float32) @ wg, axis=-1)  # (B, S, E) fp32

        def one_row(pr, xr):
            dispatch, combine, aux = dispatch_tensors(pr, self.top_k, cap)
            slots = jnp.einsum("sec,sd->ecd", dispatch.astype(self.dtype),
                               xr.astype(self.dtype))
            out = expert_swiglu({"w1": w1, "w3": w3, "w2": w2}, slots,
                                self.dtype)
            return jnp.einsum("sec,ecd->sd", combine.astype(self.dtype),
                              out), aux

        y, aux = jax.vmap(one_row)(probs, x)
        self.sow("aux_loss", "moe", jnp.mean(aux))
        return y.astype(x.dtype)
