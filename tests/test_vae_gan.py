"""VAE-GAN stack tests: discriminator shapes, hinge/LeCam math, the fused
two-optimizer train step with adaptive weight (SURVEY §2.8, §3.5)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from deco_tpu.models.gan.discriminator import NLayerDiscriminator, blur_downsample
from deco_tpu.models.gan.vae_loss import (
    LeCamState,
    VAEGANLoss,
    compute_lecam_loss,
    hinge_d_loss,
)
from deco_tpu.train.vae_gan_step import VAEGANTrainState, make_vae_gan_step


class TinyAE(nn.Module):
    """Conv encoder-decoder standing in for InternViT->DC-AE in step tests."""

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(8, (3, 3), strides=(2, 2), name="enc")(x)
        h = nn.relu(h)
        feats = h.reshape(h.shape[0], -1, 8)
        h = nn.ConvTranspose(8, (3, 3), strides=(2, 2), name="up")(h)
        out = nn.Conv(3, (3, 3), name="conv_out")(nn.relu(h))
        return out, {"student_features": feats}


class TestDiscriminator:
    def test_logit_shape(self):
        disc = NLayerDiscriminator(hidden_channels=64, num_stages=2)
        x = jnp.zeros((2, 32, 32, 3))
        params = disc.init(jax.random.PRNGKey(0), x)
        out = disc.apply(params, x)
        assert out.shape == (2, 8, 8, 1)  # 32 -> 16 -> 8, below pool target

    def test_blur_downsample_antialias(self):
        """Blur downsampling of a constant image stays constant (DC preserved)."""
        x = jnp.ones((1, 16, 16, 4)) * 3.0
        y = blur_downsample(x)
        assert y.shape == (1, 8, 8, 4)
        np.testing.assert_allclose(np.asarray(y)[0, 2:-2, 2:-2], 3.0, rtol=1e-5)


class TestLossMath:
    def test_hinge(self):
        real = jnp.asarray([2.0, 0.5])
        fake = jnp.asarray([-2.0, -0.5])
        # relu(1-2)=0, relu(1-0.5)=0.5 ; relu(1-2)=0, relu(1-0.5)=0.5
        np.testing.assert_allclose(hinge_d_loss(real, fake), 0.25)

    def test_lecam(self):
        val = compute_lecam_loss(
            jnp.float32(2.0), jnp.float32(-2.0), jnp.float32(0.5), jnp.float32(-0.5)
        )
        # relu(2 - (-0.5))^2 + relu(0.5 - (-2))^2 = 6.25 + 6.25
        np.testing.assert_allclose(val, 12.5)

    def test_generator_loss_components(self):
        cfg = VAEGANLoss(discriminator_weight=0.1, adaptive_weight=False)
        x = jnp.zeros((2, 8, 8, 3))
        recon = jnp.ones((2, 8, 8, 3)) * 0.5
        total, d = cfg.generator_loss(
            x, recon, disc_apply=lambda img: jnp.ones((2, 1)), global_step=0
        )
        assert float(d["reconstruction_loss"]) > 0
        assert float(d["gan_loss"]) == -1.0
        assert np.isfinite(float(total))


class TestVAEGANStep:
    def test_two_optimizer_step(self):
        ae = TinyAE()
        disc = NLayerDiscriminator(hidden_channels=64, num_stages=2)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
        gen_params = ae.init(jax.random.PRNGKey(1), x)["params"]
        disc_params = disc.init(jax.random.PRNGKey(2), jnp.zeros((2, 32, 32, 3)))[
            "params"
        ]
        state = VAEGANTrainState.create(
            gen_params, disc_params, optax.adam(1e-4), optax.adam(1e-4)
        )
        loss_cfg = VAEGANLoss(
            discriminator_weight=0.1, discriminator_iter_start=0,
            lecam_regularization_weight=0.001,
            distillation_weight=0.5, distillation_loss_type="cosine",
        )
        step = make_vae_gan_step(
            vae_apply=lambda p, xx, rng: ae.apply({"params": p}, xx),
            disc_apply=lambda p, img: disc.apply({"params": p}, img),
            loss_cfg=loss_cfg,
            last_layer_path=("conv_out",),
            teacher_fn=lambda xx: jnp.ones((2, 256, 8)), donate=False,
        )
        batch = {"x": x}
        s1, m1 = step(state, batch, jax.random.PRNGKey(3))
        s2, m2 = step(s1, batch, jax.random.PRNGKey(4))
        assert int(s2.step) == 2
        for k in ("total_loss", "discriminator_loss", "d_weight",
                  "distillation_loss", "lecam_loss"):
            assert np.isfinite(float(m2[k])), k
        # both param trees actually updated
        dg = jax.tree.map(lambda a, b: np.abs(a - b).max(), s2.gen_params,
                          state.gen_params)
        dd = jax.tree.map(lambda a, b: np.abs(a - b).max(), s2.disc_params,
                          state.disc_params)
        assert max(jax.tree.leaves(dg)) > 0
        assert max(jax.tree.leaves(dd)) > 0
        # LeCam EMA state moved off zero
        assert float(jnp.abs(s2.lecam.ema_real)) > 0

    def test_disc_delayed_start(self):
        """Before discriminator_iter_start the GAN terms are zeroed."""
        ae = TinyAE()
        disc = NLayerDiscriminator(hidden_channels=64, num_stages=2)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
        gen_params = ae.init(jax.random.PRNGKey(1), x)["params"]
        disc_params = disc.init(jax.random.PRNGKey(2), jnp.zeros((2, 32, 32, 3)))[
            "params"
        ]
        state = VAEGANTrainState.create(
            gen_params, disc_params, optax.adam(1e-4), optax.adam(1e-4)
        )
        loss_cfg = VAEGANLoss(
            discriminator_weight=0.1, discriminator_iter_start=1000,
            lecam_regularization_weight=0.0, adaptive_weight=False,
        )
        step = make_vae_gan_step(
            vae_apply=lambda p, xx, rng: ae.apply({"params": p}, xx),
            disc_apply=lambda p, img: disc.apply({"params": p}, img),
            loss_cfg=loss_cfg,
            last_layer_path=("conv_out",),
            donate=False,
        )
        _, m = step(state, {"x": x}, jax.random.PRNGKey(3))
        np.testing.assert_allclose(float(m["discriminator_loss"]), 0.0, atol=1e-7)
