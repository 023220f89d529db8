"""ReCo: image-conditioned pixel reconstruction model (the snapshot's
``dit_t2i_DeCo.PixNerDiT``).

Parity with reference ``src/models/transformer/dit_t2i_DeCo.py:319-633``
(hhhhzp/DeCo) — the mid-research ReCo variant (SURVEY caveat 2): a frozen,
``select_layer``-truncated InternViT encodes the conditioning image; a
latent projector maps ViT tokens to a 32-channel latent grid; the
:class:`PixelDecoder` runs 16 learnable tokens + DiT blocks over the latent
tokens (plain pre-norm, RoPE with center-position encoding for the learnable
tokens) and decodes per-patch pixels with the DeCo ``SimpleMLPAdaLN``
(patch = the ViT patch, 14).

The diffusion net interface is ``net(x_t, t, s)`` with the condition ``s``
precomputed once per image by :meth:`forward_condition` — mirroring the
trainer's two-phase call pattern (training_repa_DeCo.py:257 commented region).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from deco_tpu.models import layers as L
from deco_tpu.models.dit_t2i import NerfEmbedderT2I
from deco_tpu.models.patching import patchify, unpatchify
from deco_tpu.models.uniflow.components import PlainDiTBlock, resample_tokens
from deco_tpu.models.uniflow.vit import ViTConfig, VisionModel

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class PixelDecoder(nn.Module):
    """Latent-conditioned pixel diffusion decoder (reference :319-466)."""

    in_channels: int = 3
    latent_channel: int = 32
    hidden_size: int = 1152
    hidden_size_x: int = 64
    num_groups: int = 12
    num_encoder_blocks: int = 18
    num_decoder_blocks: int = 4
    patch_size: int = 14
    num_learnable_tokens: int = 16
    dtype: Any = jnp.bfloat16

    def setup(self):
        self.learnable_tokens = self.param(
            "learnable_tokens", nn.initializers.normal(stddev=0.02),
            (1, self.num_learnable_tokens, self.hidden_size), jnp.float32,
        )
        self.s_embedder = L.Embed(self.hidden_size, dtype=self.dtype,
                                  name="s_embedder")
        # the snapshot ReCo file defines its own NerfEmbedder over the ex2d
        # rope-cos basis (dit_t2i_DeCo.py:113-137 — the t2i variant), NOT the
        # c2i DCT basis
        self.x_embedder = NerfEmbedderT2I(self.hidden_size_x, max_freqs=8,
                                          dtype=self.dtype, name="x_embedder")
        self.t_embedder = L.TimestepEmbedder(self.hidden_size, dtype=self.dtype,
                                             name="t_embedder")
        self.blocks = [
            PlainDiTBlock(num_heads=self.num_groups, dtype=self.dtype,
                          name=f"blocks_{i}")
            for i in range(self.num_encoder_blocks)
        ]
        self.dec_net = L.SimpleMLPAdaLN(
            model_channels=self.hidden_size_x,
            out_channels=self.in_channels,
            num_res_blocks=self.num_decoder_blocks,
            patch_size=self.patch_size,
            dtype=self.dtype,
            name="dec_net",
        )

    def forward_condition(self, latent):
        """latent: (B, N, latent_channel) -> (B, N, hidden)."""
        b, n, _ = latent.shape
        grid = int(round(np.sqrt(n)))
        # ex2d table (dit_t2i_DeCo.py imports precompute_freqs_cis_ex2d as
        # precompute_freqs_cis_2d): positions span [0, grid], scale 1.0
        cos, sin = L.precompute_rope_2d(
            self.hidden_size // self.num_groups, grid, grid,
            scale=1.0, extrapolate=True,
        )
        # center position encoding for the learnable tokens (reference :421-426)
        center = grid * grid // 2
        k = self.num_learnable_tokens
        cos_full = jnp.concatenate(
            [jnp.broadcast_to(cos[center:center + 1], (k, cos.shape[1])), cos]
        )
        sin_full = jnp.concatenate(
            [jnp.broadcast_to(sin[center:center + 1], (k, sin.shape[1])), sin]
        )
        s = self.s_embedder(latent.astype(self.dtype))
        tokens = jnp.broadcast_to(
            self.learnable_tokens.astype(self.dtype), (b, k, self.hidden_size)
        )
        s = jnp.concatenate([tokens, s], axis=1)
        for block in self.blocks:
            s = block(s, (cos_full, sin_full))
        return s[:, k:]

    def __call__(self, x, t, s):
        """x: (B, H, W, C) noisy pixels; t: (B,); s: (B, N, hidden)."""
        b, h, w, _ = x.shape
        p = self.patch_size
        gh, gw = h // p, w // p
        x_patches = patchify(x, p).astype(self.dtype)
        t_emb = self.t_embedder(t.reshape(-1)).reshape(b, 1, self.hidden_size)
        s = nn.silu(t_emb + s)
        x_pix = x_patches.reshape(b, gh * gw, p * p, self.in_channels)
        x_pix = self.x_embedder(x_pix)
        out = self.dec_net(x_pix, s)
        out = out.reshape(b, gh * gw, p * p * self.in_channels)
        return unpatchify(out.astype(jnp.float32), gh, gw, p)


class ReCoModel(nn.Module):
    """Frozen-ViT conditioned reconstruction diffusion model (reference :469-633)."""

    vit: ViTConfig = ViTConfig(qk_normalization=True, norm_type="rms_norm",
                               initializer_factor=0.1)
    in_channels: int = 3
    hidden_size: int = 1152
    hidden_size_x: int = 64
    num_groups: int = 12
    num_encoder_blocks: int = 18
    num_decoder_blocks: int = 4
    select_layer: int = -1
    llm_hidden_size: int = 1536
    latent_channel: int = 32
    dtype: Any = jnp.bfloat16

    def setup(self):
        import dataclasses

        vit = self.vit
        if self.select_layer > 0:
            vit = dataclasses.replace(vit, num_layers=self.select_layer)
        self.vision_model = VisionModel(vit, dtype=self.dtype,
                                        name="vision_model")
        vh = vit.hidden_size
        self.mlp1_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                      name="mlp1_norm")
        self.mlp1_fc1 = nn.Dense(self.llm_hidden_size, dtype=self.dtype,
                                 name="mlp1_fc1")
        self.mlp1_fc2 = nn.Dense(self.llm_hidden_size, dtype=self.dtype,
                                 name="mlp1_fc2")
        self.latent_fc1 = nn.Dense(vh, dtype=self.dtype, name="latent_fc1")
        self.latent_fc2 = nn.Dense(self.latent_channel, dtype=self.dtype,
                                   name="latent_fc2")
        self.pixel_decoder = PixelDecoder(
            in_channels=self.in_channels,
            latent_channel=self.latent_channel,
            hidden_size=self.hidden_size,
            hidden_size_x=self.hidden_size_x,
            num_groups=self.num_groups,
            num_encoder_blocks=self.num_encoder_blocks,
            num_decoder_blocks=self.num_decoder_blocks,
            patch_size=vit.patch_size,
            dtype=self.dtype,
        )

    def extract_vision_feature(self, pixel_values):
        x = (pixel_values * 0.5 + 0.5 - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(
            IMAGENET_STD
        )
        hidden, _ = self.vision_model(x)
        return hidden[:, 1:]

    def extract_feature(self, pixel_values):
        """mlp1 understanding features (pixel-shuffled x0.5)."""
        embeds = resample_tokens(self.extract_vision_feature(pixel_values), 0.5)
        h = self.mlp1_norm(embeds)
        return self.mlp1_fc2(nn.gelu(self.mlp1_fc1(h), approximate=False))

    def forward_condition(self, x, vit_embeds=None):
        if vit_embeds is None:
            vit_embeds = self.extract_vision_feature(x)
        latent = self.latent_fc2(nn.gelu(self.latent_fc1(vit_embeds), approximate=False))
        return self.pixel_decoder.forward_condition(latent)

    def __call__(self, x, t, s=None, cond_image=None):
        """Denoise x_t conditioned on s (or compute s from cond_image).

        A 4-D ``s`` is a conditioning IMAGE (the net(x_t, t, y) protocol with
        y = raw image from :class:`ImageConditioner`); 3-D is precomputed
        condition tokens."""
        if s is not None and s.ndim == 4:
            cond_image, s = s, None
        if s is None:
            s = self.forward_condition(cond_image.astype(self.dtype))
        return self.pixel_decoder(x, t, s)

    def init_all(self, x, t):
        """Touch every submodule (use as the ``method`` for ``.init``)."""
        s = self.forward_condition(x)
        _ = self.extract_feature(x)
        return self.pixel_decoder(x, t, s)
