"""Autoencoder codecs (pixel-space and latent wrappers).

Parity with reference ``src/models/autoencoder/*`` (hhhhzp/DeCo): the DeCo
workloads are pixel diffusion, so the production "VAE" is the identity
:class:`PixelAE`; latent wrappers (:class:`LatentAE`, :class:`DCLatentAE`) are
provided behind an import gate since diffusers-style AEs need converted
weights.
"""

from __future__ import annotations

import jax.numpy as jnp


def uint8_to_fp(x):
    """[0,255] uint8 -> [-1,1] float (reference base.py:26-29)."""
    return (x.astype(jnp.float32) - 127.5) / 127.5


def fp_to_uint8(x):
    """[-1,1] float -> [0,255] uint8 (reference base.py:31-33)."""
    return jnp.clip((x + 1) * 127.5 + 0.5, 0, 255).astype(jnp.uint8)


class BaseAE:
    def __init__(self, scale=1.0, shift=0.0):
        self.scale = scale
        self.shift = shift

    def encode(self, x):
        raise NotImplementedError

    def decode(self, x):
        raise NotImplementedError


class PixelAE(BaseAE):
    """Identity scale/shift codec — pixel diffusion (reference pixel.py:4-11)."""

    def encode(self, x):
        return x / self.scale + self.shift

    def decode(self, x):
        return (x - self.shift) * self.scale


class LatentAE(BaseAE):
    """SD-VAE latent wrapper (reference latent.py:5-23).

    Requires converted AutoencoderKL weights; the apply functions are injected
    so this class stays framework-thin.
    """

    def __init__(self, encode_fn=None, decode_fn=None, scale=0.18215, shift=0.0,
                 precompute: bool = False):
        super().__init__(scale, shift)
        self._encode_fn = encode_fn
        self._decode_fn = decode_fn
        self.precompute = precompute

    def encode(self, x):
        if self.precompute:
            # input is a precomputed latent already
            return x * self.scale + self.shift
        if self._encode_fn is None:
            raise NotImplementedError(
                "LatentAE needs converted AutoencoderKL weights (encode_fn)"
            )
        return self._encode_fn(x) * self.scale + self.shift

    def decode(self, x):
        if self._decode_fn is None:
            raise NotImplementedError(
                "LatentAE needs converted AutoencoderKL weights (decode_fn)"
            )
        return self._decode_fn((x - self.shift) / self.scale)


class DCLatentAE(LatentAE):
    """SANA AutoencoderDC f32c32 wrapper (reference dc_latent.py:5-55)."""

    def __init__(self, encode_fn=None, decode_fn=None, scale=0.41407, shift=0.0,
                 precompute: bool = False):
        super().__init__(encode_fn, decode_fn, scale, shift, precompute)

    @classmethod
    def from_torch_state(cls, sd, scale=0.41407, shift=0.0, dtype=None,
                         attention_head_dim: int = 32):
        """Build a working codec from a diffusers/vendored AutoencoderDC
        state dict (stage geometry inferred from the weights; see
        convert.dcae_bridge — head_dim is the one structural choice a square
        qkv weight cannot encode, so it stays an argument). NHWC in/out."""
        from deco_tpu.convert.dcae_bridge import dcae_flax_from_torch

        model, params = dcae_flax_from_torch(
            sd, dtype=dtype, attention_head_dim=attention_head_dim)
        variables = {"params": params}
        return cls(
            encode_fn=lambda x: model.apply(variables, x,
                                            method=model.encode),
            decode_fn=lambda z: model.apply(variables, z,
                                            method=model.decode),
            scale=scale, shift=shift,
        )
