"""Image range conversions (reference src/utils/image_utils.py:1-108)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def normalize_to_neg1_to_1(x01):
    """[0,1] -> [-1,1]."""
    return x01 * 2.0 - 1.0


def normalize_from_neg1_to_1(xn):
    """[-1,1] -> [0,1]."""
    return (xn + 1.0) * 0.5


def normalize_imagenet(x01):
    """[0,1] -> ImageNet-normalized."""
    return (x01 - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)


def denormalize_imagenet(x, clamp: bool = True):
    """ImageNet-normalized -> [0,1]."""
    out = x * jnp.asarray(IMAGENET_STD) + jnp.asarray(IMAGENET_MEAN)
    return jnp.clip(out, 0.0, 1.0) if clamp else out


def to_uint8(x01):
    """[0,1] -> uint8 with rounding."""
    return jnp.clip(x01 * 255.0 + 0.5, 0, 255).astype(jnp.uint8)
