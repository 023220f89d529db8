"""Learning-rate schedules and per-group optimizers.

Parity with the reference's optimizer wiring:
- cosine-with-min-lr + warmup (``src/lightning_uniflow_model.py:318-323``:
  10k warmup / 200k steps / min 1e-5);
- per-step cosine schedules for the VAE-GAN G/D optimizers
  (``src/lightning_model_ae.py:188-292``);
- param groups with a lower vision-encoder LR
  (``lightning_uniflow_model.py:283-316``) via optax.multi_transform.
"""

from __future__ import annotations

import math
from typing import Callable, Sequence

import jax
import optax


def cosine_with_min_lr(base_lr: float, warmup_steps: int, total_steps: int,
                       min_lr: float) -> optax.Schedule:
    """Linear warmup then cosine decay to ``min_lr`` (HF semantics)."""

    def schedule(step):
        import jax.numpy as jnp

        warm = base_lr * jnp.minimum(step / max(warmup_steps, 1), 1.0)
        progress = jnp.clip(
            (step - warmup_steps) / max(total_steps - warmup_steps, 1), 0.0, 1.0
        )
        cos = min_lr + 0.5 * (base_lr - min_lr) * (1 + jnp.cos(math.pi * progress))
        return jnp.where(step < warmup_steps, warm, cos)

    return schedule


def adamw_with_groups(
    base_lr: float,
    group_prefixes: Sequence[str],
    group_lr: float,
    weight_decay: float = 0.0,
    betas=(0.9, 0.999),
    schedule_fn: Callable[[float], optax.Schedule] = None,
) -> optax.GradientTransformation:
    """AdamW with a different LR for params whose top-level path starts with
    any of ``group_prefixes`` (the vision-encoder lower-LR pattern)."""

    def label_fn(params):
        def label(path, _):
            keys = [p.key if hasattr(p, "key") else str(p) for p in path]
            if keys and keys[0] == "params":  # skip the flax collection root
                keys = keys[1:]
            joined = "/".join(keys)
            return "group" if any(joined.startswith(p) for p in group_prefixes) \
                else "default"

        return jax.tree_util.tree_map_with_path(label, params)

    make = lambda lr: optax.adamw(
        schedule_fn(lr) if schedule_fn else lr,
        b1=betas[0], b2=betas[1], weight_decay=weight_decay,
    )
    return optax.multi_transform(
        {"default": make(base_lr), "group": make(group_lr)}, label_fn
    )
