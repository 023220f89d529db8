"""UniFlow building blocks: token resampling, pos embeds, projector, decoder MLP.

Parity with reference ``src/models/uniflow/modeling_uniflow.py`` (hhhhzp/DeCo):
pixel_shuffle token resampling (:1718-1732 — the exact element ordering is
load-bearing for checkpoint conversion), 2-D sincos pos embeds (:117-161),
p2l/l2p patch transforms (:76-115), gated ResBlock/FinalLayer (:979-1051),
LatentProjector (:1052-1124), plain pre-norm DiT block with RoPE (:329-346),
and the time-conditioned SimpleMLPAdaLN decoder core (:1127-1219, max_period
10000 here unlike the DeCo family's 10).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from deco_tpu.models import layers as L
from deco_tpu.models.dit_t2i import nerf_rope_cos_basis


def pixel_shuffle_tokens(x, scale_factor: float):
    """Token-grid pixel shuffle; x: (B, H, W, C). Mirrors reference :1718-1732
    step-for-step so flattened orderings match converted checkpoints."""
    n, w, h, c = x.shape  # reference names dims (n, w, h, c)
    s = scale_factor
    x = x.reshape(n, w, int(h * s), int(c / s))
    x = x.transpose(0, 2, 1, 3)
    x = x.reshape(n, int(h * s), int(w * s), int(c / (s * s)))
    x = x.transpose(0, 2, 1, 3)
    return x


def resample_tokens(tokens, scale_factor: float):
    """(B, N, C) -> (B, N*s^2, C/s^2); s=0.5 downsamples, s=2 upsamples."""
    b, n, c = tokens.shape
    h = w = int(round(np.sqrt(n)))
    x = tokens.reshape(b, h, w, c)
    x = pixel_shuffle_tokens(x, scale_factor)
    return x.reshape(b, -1, x.shape[-1])


def p2l_transform(x, patch_size: int):
    """NHWC image -> (B, L, C*P*P) patch tokens, channel-major within a patch
    (reference p2l_transform_tensor :76-90 rearranges 'c h2 w2')."""
    b, h, w, c = x.shape
    p = patch_size
    x = x.reshape(b, h // p, p, w // p, p, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # (B, h1, w1, c, h2, w2)
    return x.reshape(b, (h // p) * (w // p), c * p * p)


def l2p_transform(x, patch_size: int):
    """(B, L, C*P*P) -> NHWC image (inverse of :func:`p2l_transform`)."""
    b, l, d = x.shape
    p = patch_size
    c = d // (p * p)
    g = int(round(np.sqrt(l)))
    x = x.reshape(b, g, g, c, p, p)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # (B, h1, h2, w1, w2, c)
    return x.reshape(b, g * p, g * p, c)


def get_2d_sincos_pos_embed(embed_dim: int, grid_size: int) -> np.ndarray:
    """Standard MAE-style 2-D sincos position embedding (reference :117-161)."""

    def _1d(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000**omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    grid_h = np.arange(grid_size, dtype=np.float32)
    grid_w = np.arange(grid_size, dtype=np.float32)
    grid = np.meshgrid(grid_w, grid_h)  # w goes first (reference order)
    grid = np.stack(grid, axis=0).reshape(2, 1, grid_size, grid_size)
    emb_h = _1d(embed_dim // 2, grid[0])
    emb_w = _1d(embed_dim // 2, grid[1])
    return np.concatenate([emb_h, emb_w], axis=1).astype(np.float32)


class GatedResBlock(nn.Module):
    """ResBlock with optional adaLN gate (reference :979-1015)."""

    use_gate: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, y=None):
        c = x.shape[-1]
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="in_ln")(x)
        if self.use_gate:
            mod = nn.Dense(
                3 * c, dtype=self.dtype, kernel_init=nn.initializers.zeros,
                bias_init=nn.initializers.zeros, name="adaLN_modulation",
            )(nn.silu(y))
            shift, scale, gate = jnp.split(mod, 3, axis=-1)
            h = L.modulate(h, shift, scale)
        h = nn.Dense(c, dtype=self.dtype,
                     kernel_init=nn.initializers.xavier_uniform(), name="mlp_0")(h)
        h = nn.silu(h)
        h = nn.Dense(c, dtype=self.dtype,
                     kernel_init=nn.initializers.xavier_uniform(), name="mlp_2")(h)
        if self.use_gate:
            return x + gate * h
        return x + h


class GatedFinalLayer(nn.Module):
    """DiT final layer with optional adaLN (reference :1017-1051)."""

    out_channels: int
    use_gate: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, c=None):
        hidden = x.shape[-1]
        if self.use_gate:
            mod = nn.Dense(
                2 * hidden, dtype=self.dtype, kernel_init=nn.initializers.zeros,
                bias_init=nn.initializers.zeros, name="adaLN_modulation",
            )(nn.silu(c))
            shift, scale = jnp.split(mod, 2, axis=-1)
            x = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False,
                             dtype=self.dtype, name="norm_final")(x)
            x = L.modulate(x, shift, scale)
        else:
            x = L.RMSNorm(name="norm_final")(x)
        return nn.Dense(
            self.out_channels, dtype=self.dtype,
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            name="linear",
        )(x)


class LatentProjector(nn.Module):
    """Condition-gated latent projector (reference :1052-1124):
    input/cond proj -> 3 gated ResBlocks -> gated FinalLayer -> pixel-shuffle
    down x2 -> linear to out_channels."""

    out_channels: int = 256
    num_res_blocks: int = 3
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, condition):
        c_in = x.shape[-1]
        x = nn.Dense(c_in, dtype=self.dtype,
                     kernel_init=nn.initializers.xavier_uniform(),
                     name="input_proj")(x)
        cond = nn.Dense(c_in, dtype=self.dtype,
                        kernel_init=nn.initializers.xavier_uniform(),
                        name="cond_proj")(condition)
        for i in range(self.num_res_blocks):
            x = GatedResBlock(dtype=self.dtype, name=f"res_blocks_{i}")(x, cond)
        x = GatedFinalLayer(c_in, dtype=self.dtype, name="final_layer")(x, cond)
        x = resample_tokens(x, 0.5)
        return nn.Dense(
            self.out_channels, dtype=self.dtype,
            kernel_init=nn.initializers.xavier_uniform(),
            name="post_shuffle_proj",
        )(x)


class PlainDiTBlock(nn.Module):
    """Pre-norm DiT block without adaLN: RoPE attention + SwiGLU
    (reference FlattenDiTBlock :329-346; optional causal masking for the
    semantic branch)."""

    num_heads: int
    mlp_ratio: float = 4.0
    is_causal: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, rope):
        b, n, c = x.shape
        mask = None
        if self.is_causal:
            mask = jnp.tril(jnp.ones((n, n), bool))[None, None]
        h = L.RMSNorm(name="norm1")(x)
        x = x + L.RAttention(
            num_heads=self.num_heads, dtype=self.dtype, name="attn"
        )(h, rope, mask)
        h = L.RMSNorm(name="norm2")(x)
        # reference uniflow FeedForward: w12 fused, hidden = mlp_ratio*dim
        # exactly (no 2/3 factor)
        x = x + L.SwiGLU(
            hidden_dim=int(c * self.mlp_ratio), exact_hidden=True,
            dtype=self.dtype, name="mlp"
        )(h)
        return x


class UniFlowNerfEmbedder(nn.Module):
    """Condition embedder with the rope-cos basis at max_freqs=32 over the
    TOKEN grid (reference :668-693); in/out dims equal z_channels."""

    hidden_size: int
    max_freqs: int = 32
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, z):
        b, n, c = z.shape
        grid = int(round(np.sqrt(n)))
        basis = jnp.asarray(nerf_rope_cos_basis(grid, self.max_freqs), self.dtype)
        basis = jnp.broadcast_to(basis[None], (b, n, self.max_freqs**2))
        z = jnp.concatenate([z.astype(self.dtype), basis], axis=-1)
        return nn.Dense(self.hidden_size, dtype=self.dtype, name="embedder")(z)


class TimeCondMLPAdaLN(nn.Module):
    """Token-wise diffusion MLP head with timestep embedding
    (reference uniflow SimpleMLPAdaLN :1127-1219; max_period=10000)."""

    model_channels: int
    out_channels: int
    num_res_blocks: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, t, c):
        """x: (..., C_in); t: (...,) timesteps (already x1000); c: (..., Cz)."""
        x = nn.Dense(self.model_channels, dtype=self.dtype,
                     kernel_init=nn.initializers.xavier_uniform(),
                     name="input_proj")(x)
        t_emb = L.TimestepEmbedder(
            self.model_channels, max_period=10000.0, dtype=self.dtype,
            name="time_embed",
        )(t)
        c_emb = nn.Dense(self.model_channels, dtype=self.dtype,
                         kernel_init=nn.initializers.xavier_uniform(),
                         name="cond_embed")(c)
        y = t_emb.reshape(c_emb.shape) + c_emb
        for i in range(self.num_res_blocks):
            x = GatedResBlock(dtype=self.dtype, name=f"res_blocks_{i}")(x, y)
        return GatedFinalLayer(
            self.out_channels, dtype=self.dtype, name="final_layer"
        )(x, y)
