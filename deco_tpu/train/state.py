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
