"""StyleGAN-ish patch discriminator with anti-aliased downsampling (Flax).

Parity with reference ``src/models/modules/discriminator.py:28-154``
(hhhhzp/DeCo): same-pad convs, blur-kernel downsampling (1,3,3,1 by default),
GroupNorm(32) + LeakyReLU(0.1) stages, adaptive max-pool to 16x16, conv head
to 1-channel logits. NHWC throughout.
"""

from __future__ import annotations

import math
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

BLUR_KERNEL_MAP = {3: (1, 2, 1), 4: (1, 3, 3, 1), 5: (1, 4, 6, 4, 1)}


def _same_pad(i: int, k: int, s: int) -> Tuple[int, int]:
    pad = max((math.ceil(i / s) - 1) * s + k - i, 0)
    return pad // 2, pad - pad // 2


class ConvSame(nn.Module):
    features: int
    kernel_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h, w = x.shape[1:3]
        ph = _same_pad(h, self.kernel_size, 1)
        pw = _same_pad(w, self.kernel_size, 1)
        x = jnp.pad(x, ((0, 0), ph, pw, (0, 0)))
        return nn.Conv(
            self.features, (self.kernel_size, self.kernel_size), padding="VALID",
            dtype=self.dtype, name="conv",
        )(x)


def blur_downsample(x, kernel=(1, 3, 3, 1)):
    """Depthwise blur + stride-2 downsample (reference BlurBlock :44-70)."""
    k1 = np.asarray(kernel, np.float32)
    k2 = np.outer(k1, k1)
    k2 /= k2.sum()
    c = x.shape[-1]
    kern = jnp.asarray(k2, x.dtype)[:, :, None, None]
    kern = jnp.tile(kern, (1, 1, 1, c))
    h, w = x.shape[1:3]
    ph = _same_pad(h, len(kernel), 2)
    pw = _same_pad(w, len(kernel), 2)
    x = jnp.pad(x, ((0, 0), ph, pw, (0, 0)))
    return jax.lax.conv_general_dilated(
        x, kern, (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )


def adaptive_max_pool(x, out_hw: int = 16):
    """AdaptiveMaxPool2d((16,16)) equivalent for NHWC."""
    b, h, w, c = x.shape
    if h <= out_hw and w <= out_hw:
        return x
    # torch adaptive pooling uses variable windows; for the typical
    # power-of-two inputs here h % out_hw == 0 and this is exact
    kh, kw = max(h // out_hw, 1), max(w // out_hw, 1)
    return nn.max_pool(x, (kh, kw), strides=(kh, kw))


class NLayerDiscriminator(nn.Module):
    hidden_channels: int = 128
    num_stages: int = 3
    blur_resample: bool = True
    blur_kernel_size: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, 3) in [0, 1] -> (B, 16, 16, 1) logits."""
        act = lambda v: nn.leaky_relu(v, negative_slope=0.1)
        h = act(ConvSame(self.hidden_channels, 5, dtype=self.dtype,
                         name="block_in")(x.astype(self.dtype)))
        # reference channel multipliers: (1, 1, 2, 4, ...) — first stage keeps
        # the width (discriminator.py:96)
        mult = (1,) + tuple(2**t for t in range(self.num_stages))
        for i in range(self.num_stages):
            out_ch = self.hidden_channels * mult[i + 1]
            h = ConvSame(out_ch, 3, dtype=self.dtype, name=f"stage_{i}_conv")(h)
            if self.blur_resample:
                h = blur_downsample(h, BLUR_KERNEL_MAP[self.blur_kernel_size])
            else:
                h = nn.avg_pool(h, (2, 2), strides=(2, 2))
            h = nn.GroupNorm(num_groups=32, dtype=self.dtype,
                             name=f"stage_{i}_norm")(h)
            h = act(h)
        h = adaptive_max_pool(h, 16)
        h = act(ConvSame(h.shape[-1], 1, dtype=self.dtype, name="head_conv1")(h))
        return ConvSame(1, 5, dtype=self.dtype, name="head_conv2")(h)
