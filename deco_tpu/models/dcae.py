"""DC-AE (Deep-Compression Autoencoder, SANA f32c32) in Flax.

Parity surface for the reference's vendored/diffusers AutoencoderDC
(``src/models/uniflow/modeling_dcae.py:46-606`` of hhhhzp/DeCo;
``src/models/autoencoder/dc_latent.py`` wraps the diffusers original): conv
stem with channel-repeat shortcut, ResBlock / EfficientViT-style attention
stages, pixel-(un)shuffle down/up blocks with channel-averaging shortcuts, and
an RMS-normed conv head. NHWC throughout; RMSNorm is applied channel-last
(free in NHWC — the reference pays a movedim round-trip in NCHW).

This provides the decode path for the VAE-GAN (InternViT encoder -> DC-AE
decoder) and the DCLatentAE codec; weights load through
:mod:`deco_tpu.convert.dcae_bridge` (diffusers/vendored state dicts; forward
parity pinned against the vendored reference file in
tests/test_dcae_convert_parity.py).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from deco_tpu.models import layers as L


def pixel_unshuffle(x, factor: int = 2):
    """NHWC space-to-depth matching torch.F.pixel_unshuffle channel order.

    torch output channel index = c * f^2 + fy * f + fx.
    """
    b, h, w, c = x.shape
    x = x.reshape(b, h // factor, factor, w // factor, factor, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # (B, H', W', C, fy, fx)
    return x.reshape(b, h // factor, w // factor, c * factor * factor)


def pixel_shuffle(x, factor: int = 2):
    """NHWC depth-to-space matching torch.F.pixel_shuffle channel order."""
    b, h, w, c = x.shape
    c_out = c // (factor * factor)
    x = x.reshape(b, h, w, c_out, factor, factor)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # (B, H, fy, W, fx, C')
    return x.reshape(b, h * factor, w * factor, c_out)


class ChannelRMSNorm(nn.Module):
    """RMSNorm over the channel axis (NHWC trailing dim)."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        return L.RMSNorm(eps=self.eps, name="norm")(x)


class DCRMSNorm(nn.Module):
    """diffusers ``get_normalization("rms_norm", C)``: RMSNorm with eps=1e-5
    and a zeros-init BIAS term (diffusers normalization.get_normalization
    defaults eps=1e-5, bias=True) — published DC-AE state dicts carry
    ``norm.bias`` keys, so the block norms cannot share the bias-free
    ``L.RMSNorm`` (eps 1e-6) the q/k norms use."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones,
                            (x.shape[-1],), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (x.shape[-1],), jnp.float32)
        input_dtype = x.dtype
        xf = x.astype(jnp.float32)
        variance = jnp.mean(xf**2, axis=-1, keepdims=True)
        xf = xf * jax.lax.rsqrt(variance + self.eps)
        return (weight * xf + bias).astype(input_dtype)


class DCResBlock(nn.Module):
    """Conv-Conv residual block (reference modeling_dcae.py:46-78)."""

    out_channels: int
    act: str = "silu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        act = {"silu": nn.silu, "relu6": lambda v: jnp.clip(nn.relu(v), 0, 6)}[
            self.act
        ]
        res = x
        h = nn.Conv(x.shape[-1], (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(x)
        h = act(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(h)
        h = DCRMSNorm(name="norm")(h)
        return h + res


class GLUMBConv(nn.Module):
    """SANA gated inverted-residual conv (diffusers sana_transformer.GLUMBConv)."""

    out_channels: int
    expand_ratio: float = 4.0
    use_norm: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        hidden = int(self.expand_ratio * x.shape[-1])
        res = x
        h = nn.Conv(hidden * 2, (1, 1), dtype=self.dtype, name="conv_inverted")(x)
        h = nn.silu(h)
        h = nn.Conv(hidden * 2, (3, 3), padding=1,
                    feature_group_count=hidden * 2, dtype=self.dtype,
                    name="conv_depth")(h)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * nn.silu(gate)
        h = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv_point")(h)
        if self.use_norm:
            h = DCRMSNorm(name="norm")(h)
        return h + res


class DCAttentionBlock(nn.Module):
    """RoPE + qk-norm self-attention over the HxW grid + GLUMBConv
    (reference StandardAttentionBlock, modeling_dcae.py:256-301)."""

    attention_head_dim: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        heads = c // self.attention_head_dim
        tokens = x.reshape(b, h * w, c)
        res = tokens
        qkv = nn.Dense(3 * c, use_bias=False, dtype=self.dtype, name="qkv")(tokens)
        qkv = qkv.reshape(b, h * w, 3, heads, self.attention_head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        # the vendored file aliases precompute_freqs_cis_EX2D (span
        # [0,grid], scale 1.0 — modeling_dcae.py:34-37), NOT the [0,16]-span
        # default table
        rope = L.precompute_rope_2d(self.attention_head_dim, h, w,
                                    scale=1.0, extrapolate=True)
        q, k = L.apply_rope(q, k, rope)
        # qk-norm over flattened heads (InternViT-style quirk, :165-171)
        q = L.RMSNorm(name="q_norm")(q.reshape(b, h * w, c)).reshape(
            b, h * w, heads, self.attention_head_dim
        )
        k = L.RMSNorm(name="k_norm")(k.reshape(b, h * w, c)).reshape(
            b, h * w, heads, self.attention_head_dim
        )
        o = L.sdpa(q, k, v, dtype=self.dtype).reshape(b, h * w, c)
        o = nn.Dense(c, use_bias=False, dtype=self.dtype, name="proj")(o)
        o = DCRMSNorm(name="norm_out")(o)
        tokens = o + res
        x = tokens.reshape(b, h, w, c)
        return GLUMBConv(c, dtype=self.dtype, name="conv_out")(x)


class DCDownBlock(nn.Module):
    """Strided/pixel-unshuffle downsample with channel-mean shortcut
    (modeling_dcae.py:338-381)."""

    out_channels: int
    downsample: bool = True  # True => conv then pixel_unshuffle
    shortcut: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        factor = 2
        in_ch = x.shape[-1]
        if self.downsample:
            conv_out = self.out_channels // (factor * factor)
            h = nn.Conv(conv_out, (3, 3), padding=1, dtype=self.dtype,
                        name="conv")(x)
            h = pixel_unshuffle(h, factor)
        else:
            h = nn.Conv(self.out_channels, (3, 3), strides=(2, 2), padding=1,
                        dtype=self.dtype, name="conv")(x)
        if self.shortcut:
            y = pixel_unshuffle(x, factor)
            group = in_ch * factor * factor // self.out_channels
            y = y.reshape(y.shape[:-1] + (self.out_channels, group)).mean(-1)
            h = h + y
        return h


class DCUpBlock(nn.Module):
    """Pixel-shuffle upsample with channel-repeat shortcut
    (modeling_dcae.py:383-427)."""

    out_channels: int
    interpolate: bool = False
    shortcut: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        factor = 2
        in_ch = x.shape[-1]
        if self.interpolate:
            b, h_, w_, c = x.shape
            up = jax.image.resize(x, (b, h_ * factor, w_ * factor, c), "nearest")
            h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                        name="conv")(up)
        else:
            h = nn.Conv(self.out_channels * factor * factor, (3, 3), padding=1,
                        dtype=self.dtype, name="conv")(x)
            h = pixel_shuffle(h, factor)
        if self.shortcut:
            repeats = self.out_channels * factor * factor // in_ch
            y = jnp.repeat(x, repeats, axis=-1)
            y = pixel_shuffle(y, factor)
            h = h + y
        return h


class DCAEDecoder(nn.Module):
    """Latent -> image decoder (modeling_dcae.py:526-605 + diffusers head)."""

    latent_channels: int = 32
    out_channels: int = 3
    block_out_channels: Sequence[int] = (128, 256, 512, 512, 1024, 1024)
    layers_per_block: Sequence[int] = (3, 3, 3, 3, 3, 3)
    attention_stages: Sequence[bool] = (False, False, False, True, True, True)
    attention_head_dim: int = 32
    in_shortcut: bool = True
    # head=False reproduces the reference's vendored headless decoder
    # (modeling_dcae.py:526-605 has no norm_out/conv_out): the output is the
    # block_out_channels[0]-wide feature map, used by the UniFlow DCAE-variant
    # pixel branch as per-pixel flow conditioning (modeling_uniflow_dcae.py:
    # 1168-1172, 1402-1425).
    head: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z):
        top = self.block_out_channels[-1]
        h = nn.Conv(top, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)
        if self.in_shortcut:
            repeats = top // self.latent_channels
            h = h + jnp.repeat(z, repeats, axis=-1)
        num = len(self.block_out_channels)
        for i in reversed(range(num)):
            ch = self.block_out_channels[i]
            if i < num - 1 and self.layers_per_block[i] > 0:
                h = DCUpBlock(ch, dtype=self.dtype, name=f"up_{i}")(h)
            for li in range(self.layers_per_block[i]):
                if self.attention_stages[i]:
                    h = DCAttentionBlock(
                        attention_head_dim=self.attention_head_dim,
                        dtype=self.dtype, name=f"stage_{i}_block_{li}",
                    )(h)
                else:
                    h = DCResBlock(ch, dtype=self.dtype,
                                   name=f"stage_{i}_block_{li}")(h)
        if not self.head:
            return h
        # diffusers AutoencoderDC head: RMSNorm(1e-5, bias) + ReLU + conv
        # (the original DC-AE decoder act is relu; the vendored reference
        # decoder has no head at all, so this path serves DCLatentAE only)
        h = DCRMSNorm(name="norm_out")(h)
        h = nn.relu(h)
        return nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_out")(h)


class DCAEEncoder(nn.Module):
    """Image -> latent encoder (modeling_dcae.py:429-524)."""

    latent_channels: int = 32
    block_out_channels: Sequence[int] = (128, 256, 512, 512, 1024, 1024)
    layers_per_block: Sequence[int] = (2, 2, 2, 3, 3, 3)
    attention_stages: Sequence[bool] = (False, False, False, True, True, True)
    attention_head_dim: int = 32
    out_shortcut: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.block_out_channels[0], (3, 3), padding=1,
                    dtype=self.dtype, name="conv_in")(x)
        num = len(self.block_out_channels)
        for i in range(num):
            ch = self.block_out_channels[i]
            for li in range(self.layers_per_block[i]):
                if self.attention_stages[i]:
                    h = DCAttentionBlock(
                        attention_head_dim=self.attention_head_dim,
                        dtype=self.dtype, name=f"stage_{i}_block_{li}",
                    )(h)
                else:
                    h = DCResBlock(ch, dtype=self.dtype,
                                   name=f"stage_{i}_block_{li}")(h)
            # the reference gates the DCDownBlock2d on num_layers > 0
            # (modeling_dcae.py Encoder), same as the decoder's up blocks
            if i < num - 1 and self.layers_per_block[i] > 0:
                h = DCDownBlock(self.block_out_channels[i + 1],
                                dtype=self.dtype, name=f"down_{i}")(h)
        out = nn.Conv(self.latent_channels, (3, 3), padding=1,
                      dtype=self.dtype, name="conv_out")(h)
        if self.out_shortcut:
            group = h.shape[-1] // self.latent_channels
            y = h.reshape(h.shape[:-1] + (self.latent_channels, group)).mean(-1)
            out = out + y
        return out


def _blend_v(a, b, extent: int):
    """Vertically blend the bottom of tile a into the top of tile b (NHWC)."""
    extent = min(a.shape[1], b.shape[1], extent)
    if extent <= 0:
        return b
    w = (np.arange(extent) / extent).reshape(1, extent, 1, 1)
    w = jnp.asarray(w, b.dtype)
    top = a[:, -extent:] * (1 - w) + b[:, :extent] * w
    return jnp.concatenate([top, b[:, extent:]], axis=1)


def _blend_h(a, b, extent: int):
    """Horizontally blend the right of tile a into the left of tile b."""
    extent = min(a.shape[2], b.shape[2], extent)
    if extent <= 0:
        return b
    w = (np.arange(extent) / extent).reshape(1, 1, extent, 1)
    w = jnp.asarray(w, b.dtype)
    left = a[:, :, -extent:] * (1 - w) + b[:, :, :extent] * w
    return jnp.concatenate([left, b[:, :, extent:]], axis=2)


def tiled_apply(fn, x, tile: int, stride: int, scale: float):
    """Overlapping-tile apply with linear seam blending.

    Parity with the reference's tiled encode/decode
    (modeling_dcae.py:898-1023): tiles of ``tile`` pixels at ``stride`` are
    processed independently, outputs (scaled by ``scale`` = output/input size
    ratio) are seam-blended vertically then horizontally and cropped to the
    stride grid. Bounds memory for large inputs at the cost of recompute.
    """
    b, h, w, c = x.shape
    out_tile = int(tile * scale)
    out_stride = int(stride * scale)
    blend = out_tile - out_stride
    rows = []
    for i in range(0, h, stride):
        row = []
        for j in range(0, w, stride):
            row.append(fn(x[:, i:i + tile, j:j + tile]))
        rows.append(row)
    result_rows = []
    for i, row in enumerate(rows):
        blended = []
        for j, t in enumerate(row):
            if i > 0:
                t = _blend_v(rows[i - 1][j], t, blend)
            if j > 0:
                # blend against the RAW left neighbor (diffusers semantics)
                t = _blend_h(row[j - 1], t, blend)
            blended.append(t[:, :out_stride, :out_stride])
        result_rows.append(jnp.concatenate(blended, axis=2))
    out = jnp.concatenate(result_rows, axis=1)
    return out[:, : int(h * scale), : int(w * scale)]


class AutoencoderDC(nn.Module):
    """Full DC-AE: encode to f32c32 latents and back.

    Per-side stage geometry is configurable so weights converted by
    :mod:`deco_tpu.convert.dcae_bridge` (which infers it from the state
    dict) drop straight in; defaults are the Sana f32c32 shapes."""

    latent_channels: int = 32
    dtype: Any = jnp.float32
    encoder_block_out_channels: Sequence[int] = (128, 256, 512, 512, 1024,
                                                 1024)
    encoder_layers_per_block: Sequence[int] = (2, 2, 2, 3, 3, 3)
    encoder_attention_stages: Sequence[bool] = (False, False, False, True,
                                                True, True)
    decoder_block_out_channels: Sequence[int] = (128, 256, 512, 512, 1024,
                                                 1024)
    decoder_layers_per_block: Sequence[int] = (3, 3, 3, 3, 3, 3)
    decoder_attention_stages: Sequence[bool] = (False, False, False, True,
                                                True, True)
    attention_head_dim: int = 32
    decoder_head: bool = True

    def setup(self):
        self.encoder = DCAEEncoder(
            latent_channels=self.latent_channels,
            block_out_channels=self.encoder_block_out_channels,
            layers_per_block=self.encoder_layers_per_block,
            attention_stages=self.encoder_attention_stages,
            attention_head_dim=self.attention_head_dim,
            dtype=self.dtype, name="encoder")
        self.decoder = DCAEDecoder(
            latent_channels=self.latent_channels,
            block_out_channels=self.decoder_block_out_channels,
            layers_per_block=self.decoder_layers_per_block,
            attention_stages=self.decoder_attention_stages,
            attention_head_dim=self.attention_head_dim,
            head=self.decoder_head,
            dtype=self.dtype, name="decoder")

    @property
    def spatial_compression(self) -> int:
        # a stage downsamples iff it is below the top AND has blocks
        # (reference Encoder gates the DCDownBlock2d on num_layers > 0)
        downs = sum(
            1 for i in range(len(self.encoder_block_out_channels) - 1)
            if self.encoder_layers_per_block[i] > 0
        )
        return 2 ** downs

    @property
    def decoder_expansion(self) -> int:
        # per-side: the decoder's upsampling factor is set by ITS stage
        # count, which the configurable geometry lets differ from the
        # encoder's (a decoder stage upsamples iff it is below the top AND
        # has blocks, mirroring the reference layout)
        ups = sum(
            1 for i in range(len(self.decoder_block_out_channels) - 1)
            if self.decoder_layers_per_block[i] > 0
        )
        return 2 ** ups

    def encode(self, x):
        return self.encoder(x)

    def decode(self, z):
        return self.decoder(z)

    def tiled_encode(self, x, tile_sample: int = 512, tile_stride: int = 448):
        ratio = 1.0 / self.spatial_compression
        return tiled_apply(self.encoder, x, tile_sample, tile_stride, ratio)

    def tiled_decode(self, z, tile_latent: int = 16, tile_stride: int = 14):
        return tiled_apply(self.decoder, z, tile_latent, tile_stride,
                           float(self.decoder_expansion))

    def __call__(self, x):
        return self.decode(self.encode(x))
