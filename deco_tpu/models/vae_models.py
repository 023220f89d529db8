"""VAE encoder/decoder models: InternViT encoder -> DC-AE decoder.

Parity with reference ``src/models/transformer/encoder_ae_sim.py:21-392``
(VAEModel: the deterministic InternViT->DC-AE VAE trained by the VAE-GAN
workload, SURVEY §2.8/§3.5), ``encoder_ae.py`` (stochastic posterior variant)
and ``src/lightning_dcae_eval_model.py:41-90`` (DCAE_Decoder eval model).

Pieces:
- :class:`DCDownsampleMLP` — channel projection with group-mean shortcut and
  zero-init residual MLP (encoder_ae_sim.py:21-80);
- :class:`LatentConnectorModule` — 3 zero-init residual MLP blocks + final
  proj (dit_t2i_DeCo.py:154-183);
- :class:`VAEModel` — ViT (layer-18 tap) -> pixel-shuffle x0.5 -> gen_mlp1 ->
  latent connector -> 32ch latent grid -> DC-AE decoder -> bilinear x14/16
  (the patch-14 vs f32 mismatch fix, :328-351);
- :class:`DCAEDecoderEval` — frozen-encoder features -> 3 ResBlocks ->
  LN/32ch MLP -> DC-AE decoder (lightning_dcae_eval_model.py:41-90).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from deco_tpu.models import layers as L
from deco_tpu.models.dcae import DCAEDecoder
from deco_tpu.models.uniflow.components import resample_tokens
from deco_tpu.models.uniflow.vit import ViTConfig, VisionModel

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class ResidualMLPBlock(nn.Module):
    """LayerNorm + GELU residual MLP (lightning_dcae_eval_model.py:20-38 —
    the DCAE eval model's ResBlock; NOT the LatentConnector block below)."""

    expansion_ratio: int = 4
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        h = nn.Dense(c * self.expansion_ratio, dtype=self.dtype, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(c, dtype=self.dtype, kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros, name="fc2")(h)
        return x + h


class RMSResidualMLPBlock(nn.Module):
    """RMSNorm + SiLU residual MLP with zero-init last layer — the reference
    ``dit_t2i_DeCo.ResidualMLPBlock`` (:141-152) that LatentConnectorModule
    stacks (encoder_ae_sim.py:154-158 builds the latent projector from it)."""

    expansion_ratio: int = 4
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        h = L.RMSNorm(name="norm")(x)
        h = nn.Dense(c * self.expansion_ratio, dtype=self.dtype, name="fc1")(h)
        h = nn.silu(h)
        h = nn.Dense(c, dtype=self.dtype, kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros, name="fc2")(h)
        return x + h


class LatentConnectorModule(nn.Module):
    out_channels: int
    expansion_ratio: int = 4
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        for i in range(3):
            x = RMSResidualMLPBlock(self.expansion_ratio, dtype=self.dtype,
                                    name=f"mlp_blocks_{i}")(x)
        if x.shape[-1] != self.out_channels:
            x = nn.Dense(self.out_channels, dtype=self.dtype,
                         name="final_proj")(x)
        return x


class DCDownsampleMLP(nn.Module):
    out_channels: int
    shortcut: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.out_channels, dtype=self.dtype, name="channel_proj")(x)
        if self.shortcut:
            group = x.shape[-1] // self.out_channels
            y = x.reshape(x.shape[:-1] + (self.out_channels, group)).mean(-1)
            h = h + y
        m = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="mlp_norm")(h)
        m = nn.Dense(self.out_channels, dtype=self.dtype, name="mlp_fc1")(m)
        m = nn.gelu(m, approximate=False)
        m = nn.Dense(self.out_channels, dtype=self.dtype,
                     kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros, name="mlp_fc2")(m)
        return h + m


class VAEModel(nn.Module):
    """InternViT encoder -> latent grid -> DC-AE decoder (deterministic VAE).

    ``stochastic=True`` adds the encoder_ae.py posterior: latent_projector
    outputs 2*latent_channel (mean/logvar), sampled with KL available in the
    returned extras.
    """

    vit: ViTConfig = ViTConfig(qk_normalization=True, norm_type="rms_norm",
                               initializer_factor=0.1)
    llm_hidden_size: int = 1536
    latent_channel: int = 32
    gen_select_layer: int = 18
    stochastic: bool = False
    decoder_channels: tuple = (128, 256, 512, 512, 1024, 1024)
    decoder_layers: tuple = (3, 3, 3, 3, 3, 3)
    decoder_attn: tuple = (False, False, False, True, True, True)
    dtype: Any = jnp.bfloat16

    def setup(self):
        vh = self.vit.hidden_size
        self.vision_model = VisionModel(
            self.vit, dtype=self.dtype, select_layer=self.gen_select_layer,
            name="vision_model",
        )
        # mlp1 (understanding features path)
        self.mlp1_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                      name="mlp1_norm")
        self.mlp1_fc1 = nn.Dense(self.llm_hidden_size, dtype=self.dtype,
                                 name="mlp1_fc1")
        self.mlp1_fc2 = nn.Dense(self.llm_hidden_size, dtype=self.dtype,
                                 name="mlp1_fc2")
        self.gen_mlp1 = DCDownsampleMLP(2 * vh, dtype=self.dtype,
                                        name="gen_mlp1")
        out_ch = self.latent_channel * (2 if self.stochastic else 1)
        self.latent_projector = LatentConnectorModule(
            out_channels=out_ch, expansion_ratio=1, dtype=self.dtype,
            name="latent_projector",
        )
        self.decoder = DCAEDecoder(
            latent_channels=self.latent_channel,
            block_out_channels=self.decoder_channels,
            layers_per_block=self.decoder_layers,
            attention_stages=self.decoder_attn,
            dtype=self.dtype, name="decoder",
        )

    def _vit_features(self, x):
        pixel_values = (x * 0.5 + 0.5 - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(
            IMAGENET_STD
        )
        last_hidden, tapped = self.vision_model(pixel_values)
        return last_hidden[:, 1:], tapped[:, 1:]

    def mlp1(self, feats):
        return self.mlp1_fc2(nn.gelu(self.mlp1_fc1(self.mlp1_norm(feats)), approximate=False))

    def encode_latent(self, gen_features, rng=None):
        latent = self.latent_projector(gen_features)
        extras = {}
        if self.stochastic:
            mean, logvar = jnp.split(latent, 2, axis=-1)
            logvar = jnp.clip(logvar, -30.0, 20.0)
            # diffusers DiagonalGaussianDistribution.kl(): 0.5 * SUM over the
            # latent dims per sample, then batch mean (encoder_ae.py:345-353
            # returns posterior.kl().mean()) — a global mean would shrink the
            # term by N*latent_ch and silently rescale kl_weight
            extras["kl"] = jnp.mean(0.5 * jnp.sum(
                jnp.exp(logvar) + mean.astype(jnp.float32) ** 2 - 1.0 - logvar,
                axis=(1, 2),
            ))
            if rng is not None:
                latent = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                    rng, mean.shape, mean.dtype
                )
            else:
                latent = mean
        return latent, extras

    def decode_latent(self, latent_tokens):
        """(B, N, latent_ch) tokens -> image, with the 14/16 bilinear rescale."""
        b, n, c = latent_tokens.shape
        grid = int(round(np.sqrt(n)))
        z = latent_tokens.reshape(b, grid, grid, c)
        img = self.decoder(z)
        bh, h, w, ch = img.shape
        th, tw = int(h * 14 / 16), int(w * 14 / 16)
        return jax.image.resize(img, (bh, th, tw, ch), "bilinear")

    def __call__(self, x, rng=None, return_features: bool = False):
        last_feats, gen_tap = self._vit_features(x)
        gen_features = resample_tokens(gen_tap, 0.5)
        gen_features = self.gen_mlp1(gen_features)
        latent, extras = self.encode_latent(gen_features, rng)
        recon = self.decode_latent(latent)
        extras["student_features"] = self.mlp1(resample_tokens(last_feats, 0.5))
        if return_features:
            return recon, extras
        return recon, extras


class DCAEDecoderEval(nn.Module):
    """Frozen-encoder-features -> DC-AE decoder reconstruction eval model."""

    llm_hidden_size: int = 3200
    latent_channel: int = 32
    decoder_channels: tuple = (128, 256, 512, 512, 1024, 1024)
    decoder_layers: tuple = (3, 3, 3, 3, 3, 3)
    decoder_attn: tuple = (False, False, False, True, True, True)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, vit_embeds):
        h = vit_embeds
        for i in range(3):
            h = ResidualMLPBlock(expansion_ratio=1, dtype=self.dtype,
                                 name=f"down_blocks_{i}")(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="down_norm")(h)
        h = nn.Dense(self.latent_channel, dtype=self.dtype, name="down_fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.latent_channel, dtype=self.dtype, name="down_fc2")(h)
        b, n, c = h.shape
        grid = int(round(np.sqrt(n)))
        z = h.reshape(b, grid, grid, c)
        return DCAEDecoder(
            latent_channels=self.latent_channel,
            block_out_channels=self.decoder_channels,
            layers_per_block=self.decoder_layers,
            attention_stages=self.decoder_attn,
            dtype=self.dtype, name="decoder",
        )(z)
