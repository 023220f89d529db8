"""PixNerd c2i model — DeCo's predecessor/ablation with a hyper-network decoder.

Parity with reference ``PixNerDiT``
(``src/models/transformer/dit_c2i_pixnerd.py:289-383``): DiT semantic encoder
identical to DeCo c2i, but the pixel decoder is a stack of NerfBlocks whose
per-patch MLP weights are generated from the patch token (both fc1 and fc2
column-normalized in the c2i variant), followed by RMSNorm + zero-init linear.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from deco_tpu.models import layers
from deco_tpu.models.dit_c2i_deco import run_dit_blocks
from deco_tpu.models.patching import patchify, unpatchify


class PixNerdC2I(nn.Module):
    in_channels: int = 4
    patch_size: int = 2
    num_groups: int = 12
    hidden_size: int = 1152
    hidden_size_x: int = 64
    nerf_mlpratio: int = 4
    num_blocks: int = 18
    num_cond_blocks: int = 4
    num_classes: int = 1000
    max_freqs: int = 8
    dtype: Any = jnp.bfloat16
    grad_checkpoint: bool = False
    align_layer: int = 0
    rope_scale: float = 16.0

    @nn.compact
    def __call__(self, x, t, y, s=None, mask=None, return_features: bool = False):
        b, h, w, _ = x.shape
        p = self.patch_size
        gh, gw = h // p, w // p
        rope = layers.precompute_rope_2d(
            self.hidden_size // self.num_groups, gh, gw, scale=self.rope_scale
        )
        x_patches = patchify(x, p).astype(self.dtype)
        t_emb = layers.TimestepEmbedder(
            self.hidden_size, dtype=self.dtype, name="t_embedder"
        )(t.reshape(-1)).reshape(b, 1, self.hidden_size)
        y_emb = layers.LabelEmbedder(
            self.num_classes + 1, self.hidden_size, dtype=self.dtype, name="y_embedder"
        )(y).reshape(b, 1, self.hidden_size)
        c = nn.silu(t_emb + y_emb)
        feat = None
        if s is None:
            s = layers.Embed(self.hidden_size, dtype=self.dtype, name="s_embedder")(
                x_patches
            )
            s, feat = run_dit_blocks(
                s, c, rope, mask,
                num_blocks=self.num_cond_blocks, num_heads=self.num_groups,
                dtype=self.dtype, grad_checkpoint=self.grad_checkpoint,
                align_layer=self.align_layer if return_features else 0,
                name="blocks",
            )
            s = nn.silu(t_emb + s)

        x_pix = x_patches.reshape(b, gh * gw, p * p, self.in_channels)
        x_pix = layers.NerfEmbedder(
            self.hidden_size_x, max_freqs=self.max_freqs, dtype=self.dtype,
            name="x_embedder",
        )(x_pix)
        for i in range(self.num_blocks - self.num_cond_blocks):
            x_pix = layers.NerfBlock(
                mlp_ratio=self.nerf_mlpratio, normalize_fc2=True, dtype=self.dtype,
                name=f"nerf_blocks_{i}",
            )(x_pix, s)
        x_pix = layers.RMSNorm(name="final_norm")(x_pix)
        out = nn.Dense(
            self.in_channels, dtype=self.dtype,
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            name="final_linear",
        )(x_pix)
        out = out.reshape(b, gh * gw, p * p * self.in_channels)
        img = unpatchify(out.astype(jnp.float32), gh, gw, p)
        if return_features:
            return img, feat
        return img
