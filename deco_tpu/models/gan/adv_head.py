"""Adversarial heads over DiT token features (Flax, NHWC).

Parity with reference ``src/models/layers/adv_head.py`` (hhhhzp/DeCo):
small conv discriminator heads that score a (B, L, C) token grid —
``ConvHead`` (:6-30, image tokens only), ``ConvLinearMMHead`` (:32-64,
image tokens + a pooled multimodal vector through a linear tower), and
``ConvMMHead`` (:66-114, image tokens + a second token grid through a twin
conv tower). Each conv tower is 3x [Conv 4x4 stride 2, GroupNorm(32),
SiLU] then a global average pool; outputs are sigmoid-squashed and clamped
to [0.01, 0.99] like the reference.

Upstream this file is an orphan — no call site anywhere in the reference
tree (grep-verified; half the file is commented-out variants). It is the
adversarial-head experiment surface, kept here for component completeness
behind the ``models.gan`` namespace. Token grids are assumed square
(H = W = sqrt(L)), matching the reference's ``int(math.sqrt(L))``.

Outputs are (B, 1) — the reference returns (B, 1, 1, 1) from the trailing
1x1 conv / nn.Linear; the parity test flattens both.
"""

from __future__ import annotations

import math
from typing import Any

import jax.numpy as jnp
from flax import linen as nn


def _tokens_to_grid(feature: jnp.ndarray) -> jnp.ndarray:
    """(B, L, C) row-major token grid -> (B, H, W, C), H = W = sqrt(L)."""
    b, l, c = feature.shape
    h = int(math.sqrt(l))
    assert h * h == l, f"token count {l} is not a square grid"
    return feature.reshape(b, h, h, c)


class _ConvTower(nn.Module):
    """3x [Conv 4x4 s2 p1, GroupNorm(32), SiLU] + global average pool."""

    hidden_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(3):
            x = nn.Conv(
                self.hidden_size, (4, 4), strides=(2, 2),
                padding=((1, 1), (1, 1)), dtype=self.dtype, name=f"conv{i}",
            )(x)
            x = nn.GroupNorm(num_groups=32, epsilon=1e-5, name=f"norm{i}")(x)
            x = nn.silu(x)
        return jnp.mean(x, axis=(1, 2))  # AdaptiveAvgPool2d(1)


def _squash(x):
    return jnp.clip(nn.sigmoid(x), 0.01, 0.99)


class ConvHead(nn.Module):
    """Image-token head (reference adv_head.py:6-30)."""

    hidden_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feature, text_embedding=None):
        x = _ConvTower(self.hidden_size, self.dtype, name="tower")(
            _tokens_to_grid(feature)
        )
        out = nn.Dense(1, dtype=self.dtype, name="out")(x)  # the 1x1 conv
        return _squash(out)


class ConvLinearMMHead(nn.Module):
    """Image tokens + pooled multimodal vector (reference :32-64)."""

    hidden_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, im_feature, mm_feature):
        im = _ConvTower(self.hidden_size, self.dtype, name="conv_head")(
            _tokens_to_grid(im_feature)
        )
        mm = nn.Dense(self.hidden_size, dtype=self.dtype, name="lin0")(mm_feature)
        mm = nn.silu(mm)
        mm = nn.Dense(self.hidden_size, dtype=self.dtype, name="lin1")(mm)
        mm = nn.silu(mm)
        out = nn.Dense(1, dtype=self.dtype, name="out")(
            jnp.concatenate([im, mm], axis=-1)
        )
        return _squash(out)


class ConvMMHead(nn.Module):
    """Image tokens + a second token grid through a twin tower (:66-114)."""

    hidden_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, im_feature, mm_feature):
        im = _ConvTower(self.hidden_size, self.dtype, name="conv1_head")(
            _tokens_to_grid(im_feature)
        )
        mm = _ConvTower(self.hidden_size, self.dtype, name="conv2_head")(
            _tokens_to_grid(mm_feature)
        )
        out = nn.Dense(1, dtype=self.dtype, name="out")(
            jnp.concatenate([im, mm], axis=-1)
        )
        return _squash(out)
