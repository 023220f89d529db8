"""Train state: params + EMA + optimizer state as one sharded pytree.

Replaces the reference's Lightning module state + SimpleEMA side-stream
callback (``src/callbacks/simple_ema.py:12-59``): on TPU the EMA update is a
fused ``tree_map`` inside the jitted train step (free — no side stream
needed). EMA params are kept fp32 like the reference asserts
(simple_ema.py:41).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    ema_params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @classmethod
    def create(cls, params, tx, ema: bool = True):
        params = jax.tree.map(lambda x: x.astype(jnp.float32), params)
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            ema_params=jax.tree.map(jnp.copy, params) if ema else None,
            opt_state=tx.init(params),
            tx=tx,
        )


def ema_update(ema_params, params, decay: float):
    """EMA tree update: e <- e*decay + p*(1-decay) (simple_ema.py:29-41)."""
    return jax.tree.map(
        lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay),
        ema_params,
        params,
    )

def ema_decay_schedule(step, decay: float = 0.9999, min_decay: float = 0.0,
                       update_after_step: int = 0, update_every: int = 1,
                       use_ema_warmup: bool = False, inv_gamma: float = 1.0,
                       power: float = 2.0 / 3.0):
    """Muse-style warmup-decayed EMA factor (reference ema_model.py:92-106).

    ``decay(step) = clamp(warmup(step), min_decay, decay)`` with
    ``warmup = 1 - (1 + s/inv_gamma)^-power`` when ``use_ema_warmup`` else
    the simple-average ramp ``(1+s)/(10+s)``, where
    ``s = max(0, step - update_after_step - 1)`` and steps not on the
    ``update_every`` grid (reference step():117-121) contribute decay 1.0
    (EMA unchanged) so the schedule is jit-safe as a pure per-step factor.
    """
    step = jnp.asarray(step)
    s = jnp.maximum(0, step - update_after_step - 1)
    if use_ema_warmup:
        warm = 1.0 - (1.0 + s / inv_gamma) ** -power
    else:
        warm = (1.0 + s) / (10.0 + s)
    # reference order: min(cur, decay) THEN max(cur, min_decay) — min_decay
    # wins if a config (mis)sets min_decay above decay (get_decay:103-105)
    d = jnp.maximum(jnp.minimum(warm, decay), min_decay)
    # s <= 0 -> decay 0 (EMA snaps to params), matching get_decay's early 0
    d = jnp.where(s <= 0, 0.0, d)
    if update_every > 1:
        on_grid = ((step - 1) % update_every) == 0
        d = jnp.where(on_grid, d, 1.0)
    return d.astype(jnp.float32)
