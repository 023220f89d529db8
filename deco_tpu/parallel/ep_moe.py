"""Expert parallelism: the MoE MLP sharded expert-wise over the mesh.

Completes the DP/fsdp/PP/SP/TP menu with EP (no reference counterpart —
hhhhzp/DeCo is dense-only; this pairs with :mod:`deco_tpu.models.moe`).
Layout inside one ``shard_map`` over the (data, model) mesh:

- tokens: batch over ``data``, sequence over ``model`` (the SP layout —
  composes with :mod:`deco_tpu.parallel.sp_trunk`);
- experts: sharded over ``model`` (E divisible by the axis size); router
  weights replicated.

Per MoE layer the collectives are the canonical EP pair, riding ICI:

1. each shard routes its local tokens and builds its partial (E, C, d)
   dispatch slab; ``psum_scatter`` over the expert axis reduces + scatters
   so every device ends with exactly its local experts' full slabs —
   the all-to-all-combine expressed as one XLA collective;
2. local experts run their SwiGLU on (E_local, C, d);
3. ``all_gather`` returns the expert outputs to every shard, which combines
   into its local tokens.

Exactness vs the dense :class:`~deco_tpu.models.moe.MoEMLP`: capacity-slot
assignment is global (k-major, token order). Each shard computes local
counts per (choice, expert), ``all_gather``\\ s the tiny (P, K, E) count
table, and offsets its local cumsum by the slots earlier shards (and earlier
choices on other shards) already claimed — reproducing the dense assignment
bit-for-bit, drops included (tested in tests/test_moe_ep.py).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from deco_tpu.models.moe import dispatch_tensors, expert_swiglu, topk_masks
from deco_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def expert_parallel_moe(
    params: Any,
    x: jax.Array,
    *,
    top_k: int = 2,
    capacity: int,
    mesh: Any = None,
    dtype: Any = jnp.bfloat16,
    ep_axis: str = MODEL_AXIS,
    batch_axis: str = DATA_AXIS,
):
    """Run the MoE MLP expert-parallel; equals ``MoEMLP.apply`` exactly.

    ``params``: the MoEMLP param dict (router (d,E), w1/w3 (E,d,m),
    w2 (E,m,d)) — checkpoint layout unchanged; the executor shards the
    expert-stacked kernels via in_specs. ``x``: (B, S, d), S divisible by
    the ``ep_axis`` size, E divisible too. ``capacity``: slots per
    (batch row, expert) — pass the dense module's value (it is computed
    from the GLOBAL sequence length). ``mesh=None`` uses the ambient
    ``jax.set_mesh`` mesh. Returns ((B, S, d) output, aux load-balance
    scalar).
    """
    mesh_kw = {} if mesh is None else {"mesh": mesh}
    e = params["router"].shape[-1]

    specs = {
        "router": P(),
        "w1": P(ep_axis, None, None),
        "w3": P(ep_axis, None, None),
        "w2": P(ep_axis, None, None),
    }

    @partial(
        jax.shard_map,
        in_specs=({k: specs[k] for k in specs}, P(batch_axis, ep_axis, None)),
        out_specs=(P(batch_axis, ep_axis, None), P(batch_axis)),
        check_vma=False,
        **mesh_kw,
    )
    def run(p, x_loc):
        probs = jax.nn.softmax(
            x_loc.astype(jnp.float32) @ p["router"], axis=-1)  # (B, S_loc, E)

        def one_row(pr, xr):
            # global slot assignment: offset local claims by what earlier
            # shards (and earlier choices elsewhere) already took
            masks = topk_masks(pr, top_k)  # (K, S_loc, E)
            local_counts = jnp.sum(masks, axis=1)  # (K, E)
            all_counts = jax.lax.all_gather(local_counts, ep_axis)  # (P,K,E)
            me = jax.lax.axis_index(ep_axis)
            pidx = jnp.arange(all_counts.shape[0])
            total = jnp.sum(all_counts, axis=0)  # (K, E)
            before = jnp.sum(
                jnp.where((pidx < me)[:, None, None], all_counts, 0), axis=0)
            earlier_choices = jnp.cumsum(total, axis=0) - total  # Σ_{k'<k}
            local_earlier = jnp.cumsum(local_counts, axis=0) - local_counts
            # dispatch_tensors does a k-major cumsum over LOCAL tokens (which
            # already includes local earlier-choice claims); correct to the
            # global order:
            offset = earlier_choices - local_earlier + before
            dispatch, combine, _ = dispatch_tensors(
                pr, top_k, capacity, position_offset=offset)
            # aux from GLOBAL means (the dense form is a product of means —
            # pmean of per-shard aux would be a mean of products)
            frac = jax.lax.pmean(jnp.mean(masks[0], axis=0), ep_axis)
            mp = jax.lax.pmean(jnp.mean(pr, axis=0), ep_axis)
            aux = e * jnp.sum(frac * mp)
            slab = jnp.einsum("sec,sd->ecd", dispatch.astype(dtype),
                              xr.astype(dtype))  # partial (E, C, d)
            # reduce over shards + scatter expert-wise: each device keeps its
            # local experts' complete slabs
            slab = jax.lax.psum_scatter(
                slab, ep_axis, scatter_dimension=0, tiled=True)
            out = expert_swiglu(p, slab, dtype)  # (E_local, C, d)
            out = jax.lax.all_gather(out, ep_axis, axis=0, tiled=True)
            y = jnp.einsum("sec,ecd->sd", combine.astype(dtype), out)
            return y, aux

        y, aux = jax.vmap(one_row)(probs, x_loc)
        return y.astype(x_loc.dtype), aux

    y, aux = run(params, x)
    return y, jnp.mean(aux)
