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


class TestLegacyTiTokLosses:
    """Legacy TiTok loss family (reference src/models/modules/losses.py)."""

    def _setup(self):
        disc = NLayerDiscriminator(hidden_channels=32, num_stages=1)
        x = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 3))
        params = disc.init(jax.random.PRNGKey(1), x)["params"]
        apply = lambda p, img: disc.apply({"params": p}, img)
        return apply, params, x

    def test_vq_generator_composition(self):
        from deco_tpu.models.gan.legacy_losses import TiTokLoss

        apply, params, x = self._setup()
        cfg = TiTokLoss(stage=0, quantize_mode="vq", quantizer_weight=0.5,
                        discriminator_weight=0.1, discriminator_start=0)
        recon = x * 0.9
        extra = {"quantizer_loss": jnp.float32(0.4),
                 "commitment_loss": jnp.float32(0.1),
                 "codebook_loss": jnp.float32(0.3)}
        total, m = cfg.generator_loss(apply, params, x, recon, extra,
                                      global_step=jnp.int32(5))
        # total = rec + 0.5*q + 0.1*gan  (no perceptual fn)
        expected = (float(m["reconstruction_loss"]) + 0.5 * 0.4
                    + 0.1 * float(m["gan_loss"]))
        np.testing.assert_allclose(float(total), expected, rtol=1e-5)
        assert float(m["quantizer_loss"]) == np.float32(0.5 * 0.4)

    def test_vae_mode_fixed_logvar_and_kl(self):
        from deco_tpu.models.gan.legacy_losses import TiTokLoss

        apply, params, x = self._setup()
        # stage1 vae mode: inputs imagenet-normalized, recon in [-1,1]
        cfg = TiTokLoss(stage=1, quantize_mode="vae", kl_weight=1e-2,
                        logvar_init=1.0, discriminator_weight=0.0)
        xn = (x - jnp.asarray([0.485, 0.456, 0.406])) / jnp.asarray(
            [0.229, 0.224, 0.225])
        recon = x * 2.0 - 1.0  # decodes exactly back to x in [0,1]
        total, m = cfg.generator_loss(
            apply, params, xn, recon, {"kl": jnp.float32(3.0)},
            global_step=jnp.int32(0))
        # perfect reconstruction after alignment -> rec==0; total = kl term
        np.testing.assert_allclose(float(m["reconstruction_loss"]), 0.0,
                                   atol=1e-9)
        np.testing.assert_allclose(float(total), 1e-2 * 3.0, rtol=1e-5)

    def test_discriminator_gate_and_lecam(self):
        from deco_tpu.models.gan.legacy_losses import TiTokLoss

        apply, params, x = self._setup()
        cfg = TiTokLoss(stage=0, quantize_mode="vq", discriminator_start=10,
                        lecam_regularization_weight=0.1)
        lecam = LeCamState.create()
        # before start: hinge term gated to zero, lecam still applies
        d0, lecam1, m0 = cfg.discriminator_loss(
            apply, params, x, x * 0.5, jnp.int32(5), lecam)
        assert float(m0["discriminator_loss"]) == float(m0["lecam_loss"])
        # EMA advanced
        assert float(lecam1.ema_real) != 0.0 or float(lecam1.ema_fake) != 0.0
        # after start: hinge term active
        d1, _, m1 = cfg.discriminator_loss(
            apply, params, x, x * 0.5, jnp.int32(20), lecam1)
        assert float(d1) != float(m1["lecam_loss"])

    def test_jittable(self):
        from deco_tpu.models.gan.legacy_losses import TiTokLoss

        apply, params, x = self._setup()
        cfg = TiTokLoss(stage=2, quantize_mode="vae", distill_weight=0.5)
        distill_fn = lambda inp, feat: ((feat - 1.0) ** 2).mean()
        extra = {"kl": jnp.float32(0.1),
                 "distill_feat": jnp.ones((2, 4), jnp.float32)}

        @jax.jit
        def g(params, x, recon, step):
            return cfg.generator_loss(apply, params, x, recon, extra, step,
                                      distill_fn=distill_fn)[0]

        v = g(params, x, x * 0.5, jnp.int32(3))
        assert np.isfinite(float(v))


def test_stochastic_vae_kl_reduction_matches_diffusers():
    """The reference KL is diffusers DiagonalGaussianDistribution.kl():
    0.5 * SUM(mean^2 + var - 1 - logvar) over the latent dims PER SAMPLE,
    then batch mean (encoder_ae.py:345-353 returns posterior.kl().mean()) —
    not a global mean, which would shrink the term by N*latent_ch and
    silently rescale kl_weight. Pin our encode_latent KL on a crafted
    latent against the formula, incl. the [-30, 20] logvar clamp."""
    import jax
    import jax.numpy as jnp

    from deco_tpu.models.uniflow.vit import ViTConfig
    from deco_tpu.models.vae_models import VAEModel

    model = VAEModel(
        vit=ViTConfig(hidden_size=16, num_layers=1, num_heads=2,
                      intermediate_size=32, patch_size=14, image_size=28,
                      qk_normalization=True, norm_type="rms_norm"),
        llm_hidden_size=12, latent_channel=4, gen_select_layer=1,
        stochastic=True, decoder_channels=(8, 8), decoder_layers=(1, 1),
        decoder_attn=(False, False), dtype=jnp.float32,
    )
    x = jnp.zeros((2, 28, 28, 3))
    params = model.init(jax.random.PRNGKey(0), x)

    rs = np.random.RandomState(5)
    width = params["params"]["latent_projector"]["mlp_blocks_0"][
        "norm"]["weight"].shape[0]
    feats = jnp.asarray(rs.randn(2, 4, width).astype(np.float32))

    latent, extras = model.apply(params, feats, method=VAEModel.encode_latent)
    moments = model.apply(
        params, feats,
        method=lambda m, f: m.latent_projector(f))
    mean, logvar = np.split(np.asarray(moments, np.float64), 2, axis=-1)
    logvar = np.clip(logvar, -30.0, 20.0)
    want = np.mean(0.5 * np.sum(
        np.exp(logvar) + mean**2 - 1.0 - logvar, axis=(1, 2)))
    np.testing.assert_allclose(float(extras["kl"]), want, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(latent), mean.astype(np.float32),
                               rtol=1e-5, atol=1e-6)
