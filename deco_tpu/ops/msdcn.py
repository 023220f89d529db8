"""Multi-scale deformable convolution (MSDCN) — TPU equivalent of the
reference's Triton kernels.

Parity with reference ``src/models/layers/msdcn.py`` (hhhhzp/DeCo): per output
position and group, K learned sampling points bilinearly interpolate the value
grid (zero outside the image, matching the Triton masks, :21-102) and are
combined with learned per-point weights; :class:`MultiScaleDCN` wraps the op
with offset/scale/weight projections and the multi-scale sigmoid prior init
(:258-302).

NOTE: this op is ORPHANED upstream (no call sites outside its own file,
SURVEY §2.9) — it ships behind the ``deco_tpu.ops.msdcn`` namespace for
capability parity. The TPU implementation is a vectorized XLA gather (one
gather of 4*K corners per position); gathers of this shape lower to efficient
dynamic-slice batches, and autodiff provides the backward (the reference needs
a 300-line hand-written Triton backward). A Pallas double-buffered variant is
unwarranted until the op gains a call site.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def deformable_sample(v, deformables, weights):
    """v: (B, H, W, G, C); deformables: (B, H, W, G, K, 2) xy offsets;
    weights: (B, H, W, G, K). Returns (B, H, W, G, C)."""
    b, h, w, g, c = v.shape
    k = weights.shape[-1]
    xs = jnp.arange(w, dtype=deformables.dtype)
    ys = jnp.arange(h, dtype=deformables.dtype)
    # absolute sample coordinates (x = offset + wid, y = offset + hid)
    x = deformables[..., 0] + xs[None, None, :, None, None]
    y = deformables[..., 1] + ys[None, :, None, None, None]
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1, y1 = x0 + 1, y0 + 1

    def corner(yc, xc, wgt):
        valid = (yc >= 0) & (yc < h) & (xc >= 0) & (xc < w)
        yc = jnp.clip(yc, 0, h - 1)
        xc = jnp.clip(xc, 0, w - 1)
        # gather v[b, yc, xc, g, :] for each (b, h, w, g, k)
        bi = jnp.arange(b)[:, None, None, None, None]
        gi = jnp.arange(g)[None, None, None, :, None]
        sampled = v[bi, yc, xc, gi]  # (B, H, W, G, K, C)
        return sampled * (wgt * valid)[..., None]

    out = (
        corner(y0, x0, (x1 - x) * (y1 - y))
        + corner(y0, x1, (x - x0) * (y1 - y))
        + corner(y1, x0, (x1 - x) * (y - y0))
        + corner(y1, x1, (x - x0) * (y - y0))
    )
    return jnp.einsum("bhwgkc,bhwgk->bhwgc", out, weights)


class MultiScaleDCN(nn.Module):
    """Deformable attention-style module (reference msdcn.py:258-302)."""

    groups: int
    channels: int
    kernels: int
    max_scale: float = 6.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, _ = x.shape
        g, c, k = self.groups, self.channels, self.kernels
        v = nn.Dense(g * c, dtype=self.dtype, name="v")(x).reshape(b, h, w, g, c)
        deform = nn.Dense(
            g * k * 2, dtype=self.dtype, kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros, name="qk_deformables",
        )(x).reshape(b, h, w, g, k, 2)
        scale = nn.Dense(
            g * k, use_bias=False, dtype=self.dtype,
            kernel_init=nn.initializers.zeros, name="qk_scales",
        )(x).reshape(b, h, w, g, k, 1)
        wts = nn.Dense(
            g * k, dtype=self.dtype, kernel_init=nn.initializers.zeros,
            name="qk_weights",
        )(x).reshape(b, h, w, g, k)

        # multi-scale prior: grid offsets + per-group log-scale init
        num_prior = int(round(math.sqrt(k)))
        prior = np.zeros((k, 2), np.float32)
        if num_prior >= 1:
            d = np.linspace(-1, 1, num_prior)
            gx, gy = np.meshgrid(d, d, indexing="xy")
            prior[: num_prior * num_prior] = np.stack(
                [gx.reshape(-1), gy.reshape(-1)], -1
            )
        inv_scales = np.array(
            [math.log(((i + 1) / g - 1e-4) / (1 - ((i + 1) / g - 1e-4)))
             for i in range(g)], np.float32,
        )
        deform_scale = self.param(
            "deformables_scale",
            lambda rng: jnp.asarray(inv_scales).reshape(1, 1, 1, g, 1, 1),
        )
        prior_c = jnp.asarray(prior).reshape(1, 1, 1, 1, k, 2)
        scale = jax.nn.sigmoid(scale + deform_scale) * self.max_scale
        deform = (deform + prior_c) * scale
        out = deformable_sample(v, deform, wts)
        out = out.reshape(b, h, w, g * c)
        return nn.Dense(
            x.shape[-1], dtype=self.dtype, bias_init=nn.initializers.zeros,
            name="out",
        )(out)
