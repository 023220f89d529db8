"""InternViT-style vision transformer encoder (Flax).

Shared by the UniFlow main/shallow encoders, the vendored-InternViT parity
surface (SURVEY §2.7), and the VAE encoder path. Parity with reference
``src/models/uniflow/modeling_uniflow.py:348-666`` (== ``src/models/
transformer/modeling_intern_vit.py`` minus HF plumbing):

- Conv patch embed (patch 14) + cls token + learnable position embedding with
  bicubic interpolation to arbitrary grids;
- pre-norm blocks: norm1 -> attention (optional qk RMSNorm applied over the
  FULL embed dim, flattened across heads — InternViT quirk, :458-476) ->
  layer-scale ls1 -> residual; norm2 -> GELU MLP -> ls2 -> residual;
- norm_type selects LayerNorm or RMSNorm; qkv bias per config.

The per-layer stack runs under ``nn.scan`` with an optional per-layer tap for
``select_layer`` truncation (InternVL semantics) and hidden-state collection.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from deco_tpu.models import layers as L


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    patch_size: int = 14
    image_size: int = 448
    qkv_bias: bool = True
    qk_normalization: bool = False
    norm_type: str = "layer_norm"  # or "rms_norm"
    layer_norm_eps: float = 1e-6
    initializer_factor: float = 1.0


def interp_pos_embed(pos_embed, grid_h: int, grid_w: int):
    """Bicubic-resize a (1, N, C) grid pos embed to (1, grid_h*grid_w, C)."""
    n = pos_embed.shape[1]
    orig = int(round(np.sqrt(n)))
    if (orig, orig) == (grid_h, grid_w):
        return pos_embed
    pe = pos_embed.astype(jnp.float32).reshape(1, orig, orig, -1)
    pe = jax.image.resize(pe, (1, grid_h, grid_w, pe.shape[-1]), method="cubic")
    return pe.reshape(1, grid_h * grid_w, -1)


def _norm(cfg: ViTConfig, name: str):
    if cfg.norm_type == "rms_norm":
        return L.RMSNorm(eps=cfg.layer_norm_eps, name=name)
    return nn.LayerNorm(epsilon=cfg.layer_norm_eps, name=name)


class ViTEmbeddings(nn.Module):
    cfg: ViTConfig
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, pixel_values):
        """pixel_values: (B, H, W, 3) -> (B, 1+N, C) with cls token first."""
        cfg = self.cfg
        b, h, w, _ = pixel_values.shape
        patches = nn.Conv(
            cfg.hidden_size,
            kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            padding="VALID",
            dtype=self.dtype,
            name="patch_embedding",
        )(pixel_values.astype(self.dtype))
        gh, gw = h // cfg.patch_size, w // cfg.patch_size
        patches = patches.reshape(b, gh * gw, cfg.hidden_size)
        cls = self.param(
            "class_embedding", nn.initializers.normal(1.0),
            (1, 1, cfg.hidden_size), jnp.float32,
        )
        base_grid = cfg.image_size // cfg.patch_size
        pos = self.param(
            "position_embedding", nn.initializers.normal(1.0),
            (1, base_grid * base_grid + 1, cfg.hidden_size), jnp.float32,
        )
        pos_grid = interp_pos_embed(pos[:, 1:], gh, gw)
        pos_full = jnp.concatenate([pos[:, :1].astype(jnp.float32), pos_grid], axis=1)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(self.dtype), (b, 1, cfg.hidden_size)),
             patches], axis=1,
        )
        return x + pos_full.astype(self.dtype)


class ViTLayer(nn.Module):
    cfg: ViTConfig
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        b, n, c = x.shape
        head_dim = c // cfg.num_heads
        h = _norm(cfg, "norm1")(x)
        qkv = nn.Dense(3 * c, use_bias=cfg.qkv_bias, dtype=self.dtype, name="qkv")(h)
        qkv = qkv.reshape(b, n, 3, cfg.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        if cfg.qk_normalization:
            # InternViT quirk: RMSNorm over the flattened (heads*dim) axis
            q = L.RMSNorm(eps=cfg.layer_norm_eps, name="q_norm")(
                q.reshape(b, n, c)
            ).reshape(b, n, cfg.num_heads, head_dim)
            k = L.RMSNorm(eps=cfg.layer_norm_eps, name="k_norm")(
                k.reshape(b, n, c)
            ).reshape(b, n, cfg.num_heads, head_dim)
        attn = L.sdpa(q, k, v, dtype=self.dtype).reshape(b, n, c)
        attn = nn.Dense(c, dtype=self.dtype, name="proj")(attn)
        ls1 = self.param(
            "ls1", nn.initializers.constant(cfg.initializer_factor), (c,), jnp.float32
        )
        x = x + attn * ls1.astype(self.dtype)

        h = _norm(cfg, "norm2")(x)
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(c, dtype=self.dtype, name="fc2")(h)
        ls2 = self.param(
            "ls2", nn.initializers.constant(cfg.initializer_factor), (c,), jnp.float32
        )
        return x + h * ls2.astype(self.dtype)


class _ViTScanCell(nn.Module):
    cfg: ViTConfig
    dtype: Any = jnp.bfloat16
    select_layer: int = 0  # 1-based tap; 0 = off

    @nn.compact
    def __call__(self, carry, _):
        x, tapped, idx = carry
        x = ViTLayer(self.cfg, dtype=self.dtype, name="layer")(x)
        if self.select_layer:
            tapped = jnp.where(idx == self.select_layer - 1, x, tapped)
        return (x, tapped, idx + 1), None


class ViTEncoder(nn.Module):
    """Stack of ViT layers under nn.scan with optional select_layer tap."""

    cfg: ViTConfig
    dtype: Any = jnp.bfloat16
    select_layer: int = 0
    grad_checkpoint: bool = False

    @nn.compact
    def __call__(self, x):
        cell = _ViTScanCell
        if self.grad_checkpoint:
            cell = nn.remat(cell, prevent_cse=False)
        scanned = nn.scan(
            cell,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            in_axes=(nn.broadcast,),
            length=self.cfg.num_layers,
            metadata_params={nn.meta.PARTITION_NAME: None},
        )(self.cfg, dtype=self.dtype, select_layer=self.select_layer,
          name="layers")
        (x, tapped, _), _ = scanned((x, jnp.zeros_like(x), jnp.int32(0)), None)
        if self.select_layer:
            return x, tapped
        return x, None


class VisionModel(nn.Module):
    """Embeddings + encoder; returns (last_hidden, tapped_hidden)."""

    cfg: ViTConfig
    dtype: Any = jnp.bfloat16
    select_layer: int = 0
    grad_checkpoint: bool = False

    @nn.compact
    def __call__(self, pixel_values):
        x = ViTEmbeddings(self.cfg, dtype=self.dtype, name="embeddings")(pixel_values)
        return ViTEncoder(
            self.cfg, dtype=self.dtype, select_layer=self.select_layer,
            grad_checkpoint=self.grad_checkpoint, name="encoder",
        )(x)
