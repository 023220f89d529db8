"""VAE-GAN loss composition parity vs the reference VAEReconstructionLoss.

Pins the generator and discriminator objectives of
``src/models/modules/vae_loss.py:118-560`` against
``models/gan/vae_loss.VAEGANLoss`` end-to-end: L2 recon in [0,1], hinge-G
through the (converted) internal NLayerDiscriminator, the
discriminator_factor gate, hinge-D on detached reconstructions, and the
LeCam regularization against zero-initialized EMA buffers. The perceptual
tower is env-gated (stubbed to zero on the reference side, ``None`` here);
the adaptive d_weight needs a live autograd graph to the decoder last layer
(reference eval-mode skips it; the vjp-based equivalent is covered by
tests/test_vae_gan.py)."""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not available"
)


@pytest.fixture(scope="module")
def ref_loss():
    torch = pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from ref_stub_util import install_stubs, remove_stubs

    added = install_stubs(torch)
    from src.models.modules import vae_loss

    yield vae_loss
    remove_stubs(added)


def test_vae_gan_loss_parity(ref_loss):
    import torch

    import jax.numpy as jnp

    from deco_tpu.convert.torch_to_flax import convert_discriminator
    from deco_tpu.models.gan.discriminator import NLayerDiscriminator
    from deco_tpu.models.gan.vae_loss import LeCamState, VAEGANLoss

    tloss = ref_loss.VAEReconstructionLoss(
        discriminator_start=0, distillation_weight=0.0,
        teacher_model_path=None,
    ).eval()
    g = torch.Generator().manual_seed(10)
    with torch.no_grad():
        for p in tloss.discriminator.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.1)

    rng = np.random.RandomState(10)
    b = 2
    # 128px: three stride-2 stages -> 16x16 logits, adaptive pool a no-op
    inputs = rng.uniform(-1, 1, (b, 3, 128, 128)).astype(np.float32)
    recon = (inputs + 0.1 * rng.randn(b, 3, 128, 128)).astype(np.float32)

    with torch.no_grad():
        g_total_t, g_dict_t = tloss(
            torch.from_numpy(inputs), torch.from_numpy(recon), {},
            global_step=10, mode="generator",
        )
        d_total_t, d_dict_t = tloss(
            torch.from_numpy(inputs), torch.from_numpy(recon), {},
            global_step=10, mode="discriminator",
        )

    params = convert_discriminator(
        {k: v.numpy() for k, v in tloss.discriminator.state_dict().items()})
    jdisc = NLayerDiscriminator(dtype=jnp.float32)  # reference defaults
    disc_apply = lambda x01: jdisc.apply({"params": params}, x01)

    cfg = VAEGANLoss(
        reconstruction_loss="l2", perceptual_weight=1.1,
        discriminator_weight=0.1, discriminator_factor=1.0,
        discriminator_iter_start=0, lecam_regularization_weight=0.001,
        adaptive_weight=False,
    )
    jin = jnp.asarray(inputs.transpose(0, 2, 3, 1))
    jre = jnp.asarray(recon.transpose(0, 2, 3, 1))
    g_total_j, g_dict_j = cfg.generator_loss(
        jin, jre, disc_apply, global_step=10, perceptual_fn=None,
    )
    d_total_j, d_dict_j, new_state = cfg.discriminator_loss(
        jin, jre, disc_apply, global_step=10,
        lecam_state=LeCamState.create(),
    )

    np.testing.assert_allclose(float(g_total_j), float(g_total_t),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(
        float(g_dict_j["reconstruction_loss"]),
        float(g_dict_t["reconstruction_loss"]), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(g_dict_j["gan_loss"]),
                               float(g_dict_t["gan_loss"]),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(float(g_dict_j["weighted_gan_loss"]),
                               float(g_dict_t["weighted_gan_loss"]),
                               rtol=1e-3, atol=1e-4)

    np.testing.assert_allclose(float(d_total_j), float(d_total_t),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(float(d_dict_j["logits_real"]),
                               float(d_dict_t["logits_real"]),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(float(d_dict_j["lecam_loss"]),
                               float(d_dict_t["lecam_loss"]),
                               rtol=1e-3, atol=1e-7)
    # our LeCam EMA update (the reference mutates buffers only in train mode)
    assert float(new_state.ema_real) != 0.0
