"""Classifier-free guidance combination functions.

Parity with reference ``src/diffusion/base/guidance.py:3-36``. All functions
take the network output over a CFG-doubled batch laid out as
``[uncondition; condition]`` (uncond first — this order is load-bearing for
checkpoint/weight parity) and a guidance scale, and return the guided output at
the original batch size. ``cfg`` may be a traced scalar (per-step guidance
schedules ride through ``lax.scan``).
"""

from __future__ import annotations

import jax.numpy as jnp


def simple_guidance_fn(out, cfg):
    uncondition, condition = jnp.split(out, 2, axis=0)
    return uncondition + cfg * (condition - uncondition)


def guidance_fn_with_rescale(out, cfg, rescale_factor=0.7):
    """CFG with variance rescale (reference guidance.py:8-30)."""
    uncondition, condition = jnp.split(out, 2, axis=0)
    guided = uncondition + cfg * (condition - uncondition)
    reduce_axes = tuple(range(1, out.ndim))
    std_condition = jnp.std(condition, axis=reduce_axes, keepdims=True)
    std_guided = jnp.std(guided, axis=reduce_axes, keepdims=True)
    scale = std_condition / (std_guided + 1e-6)
    return guided * (scale * rescale_factor + 1.0 * (1.0 - rescale_factor))


def c3_guidance_fn(out, cfg):
    """DiT/SiT-style guidance on the first 3 channels only.

    Reference guidance.py:32-36 operates on NCHW; here the channel axis is the
    trailing one (NHWC layout used throughout deco_tpu).
    """
    uncondition, condition = jnp.split(out, 2, axis=0)
    guided_c3 = uncondition[..., :3] + cfg * (condition[..., :3] - uncondition[..., :3])
    return jnp.concatenate([guided_c3, condition[..., 3:]], axis=-1)
