"""DC-AE codec: shapes, roundtrip grid math, tiled decode vs direct."""

import jax
import jax.numpy as jnp
import numpy as np

from deco_tpu.models.dcae import (
    AutoencoderDC,
    DCAEDecoder,
    DCAEEncoder,
    pixel_shuffle,
    pixel_unshuffle,
    tiled_apply,
)


class TestPixelOps:
    def test_shuffle_roundtrip_matches_torch_order(self):
        import torch

        x = jnp.asarray(np.random.RandomState(0).randn(1, 4, 4, 8), jnp.float32)
        down = pixel_unshuffle(x, 2)
        tx = torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2)
        tdown = torch.nn.functional.pixel_unshuffle(tx, 2)
        np.testing.assert_allclose(
            np.asarray(down), tdown.permute(0, 2, 3, 1).numpy(), atol=1e-6
        )
        up = pixel_shuffle(down, 2)
        np.testing.assert_allclose(up, x, atol=1e-6)


class TestCodec:
    def test_encode_decode_shapes(self):
        enc = DCAEEncoder(latent_channels=4, block_out_channels=(8, 16, 16),
                          layers_per_block=(1, 1, 1),
                          attention_stages=(False, False, False))
        dec = DCAEDecoder(latent_channels=4, block_out_channels=(8, 16, 16),
                          layers_per_block=(1, 1, 1),
                          attention_stages=(False, False, False))
        x = jnp.zeros((1, 16, 16, 3))
        pe = enc.init(jax.random.PRNGKey(0), x)
        z = enc.apply(pe, x)
        assert z.shape == (1, 4, 4, 4)  # /4 spatial (2 downs), 4 channels
        pd = dec.init(jax.random.PRNGKey(1), z)
        out = dec.apply(pd, z)
        assert out.shape == (1, 16, 16, 3)

    def test_tiled_matches_direct_on_interior(self):
        dec = DCAEDecoder(latent_channels=4, block_out_channels=(8, 16),
                          layers_per_block=(1, 1),
                          attention_stages=(False, False))
        z = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 4), jnp.float32)
        p = dec.init(jax.random.PRNGKey(0), z)
        direct = dec.apply(p, z)  # (1, 16, 16, 3)
        tiled = tiled_apply(lambda t: dec.apply(p, t), z, tile=8, stride=8,
                            scale=2.0)
        # stride == tile -> no overlap: conv padding effects only at tile
        # borders; with a single tile the result is identical
        np.testing.assert_allclose(tiled, direct, atol=1e-5)

    def test_tiled_blending_shape(self):
        dec = DCAEDecoder(latent_channels=4, block_out_channels=(8, 16),
                          layers_per_block=(1, 1),
                          attention_stages=(False, False))
        z = jnp.asarray(np.random.RandomState(0).randn(1, 8, 8, 4), jnp.float32)
        p = dec.init(jax.random.PRNGKey(0), z)
        tiled = tiled_apply(lambda t: dec.apply(p, t), z, tile=6, stride=4,
                            scale=2.0)
        assert tiled.shape == (1, 16, 16, 3)
        assert np.isfinite(np.asarray(tiled)).all()
