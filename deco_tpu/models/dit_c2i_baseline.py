"""Baseline flat DiT (ablation model).

Parity with reference ``FlattenDiT``
(``src/models/transformer/dit_c2i_baseline.py:289-401``, config
``configs_c2i/Baseline_DiT.yaml``): standard DiT — patch embed, all blocks at
full width, adaLN FinalLayer (zero-init) back to patch pixels.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from deco_tpu.models import layers
from deco_tpu.models.dit_c2i_deco import run_dit_blocks
from deco_tpu.models.patching import patchify, unpatchify


class BaselineDiT(nn.Module):
    in_channels: int = 4
    patch_size: int = 2
    num_groups: int = 12
    hidden_size: int = 1152
    num_blocks: int = 18
    num_classes: int = 1000
    dtype: Any = jnp.bfloat16
    grad_checkpoint: bool = False
    align_layer: int = 0
    rope_scale: float = 16.0

    @nn.compact
    def __call__(self, x, t, y, mask=None, return_features: bool = False):
        b, h, w, _ = x.shape
        p = self.patch_size
        gh, gw = h // p, w // p
        rope = layers.precompute_rope_2d(
            self.hidden_size // self.num_groups, gh, gw, scale=self.rope_scale
        )
        xp = patchify(x, p).astype(self.dtype)
        xe = layers.Embed(self.hidden_size, dtype=self.dtype, name="x_embedder")(xp)
        t_emb = layers.TimestepEmbedder(
            self.hidden_size, dtype=self.dtype, name="t_embedder"
        )(t.reshape(-1)).reshape(b, 1, self.hidden_size)
        y_emb = layers.LabelEmbedder(
            self.num_classes + 1, self.hidden_size, dtype=self.dtype, name="y_embedder"
        )(y).reshape(b, 1, self.hidden_size)
        c = nn.silu(t_emb + y_emb)
        xe, feat = run_dit_blocks(
            xe, c, rope, mask,
            num_blocks=self.num_blocks, num_heads=self.num_groups,
            dtype=self.dtype, grad_checkpoint=self.grad_checkpoint,
            align_layer=self.align_layer if return_features else 0,
            name="blocks",
        )
        out = layers.FinalLayer(
            self.in_channels * p * p, dtype=self.dtype, name="final_layer"
        )(xe, c)
        img = unpatchify(out.astype(jnp.float32), gh, gw, p)
        if return_features:
            return img, feat
        return img
