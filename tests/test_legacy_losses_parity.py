"""Legacy TiTok loss parity vs the reference ReconstructionLoss_Stage1.

Pins ``models/gan/legacy_losses.TiTokLoss`` (stage 1, vq mode) against the
reference ``src/models/modules/losses.py:219-330`` with the internal
discriminator converted: the imagenet-denorm / [-1,1]->[0,1] alignment, L2
recon, quantizer-weighted aux term, the factor-gated hinge-G, and the
discriminator mode with LeCam against zero EMA buffers. The perceptual
tower is env-gated (stub returns zeros upstream, ``None`` here). The
reference takes an OmegaConf-style config; a minimal attribute-dict shim
stands in (omegaconf is not installed)."""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not available"
)


class _Cfg(dict):
    __getattr__ = dict.__getitem__


@pytest.fixture(scope="module")
def ref_losses():
    torch = pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from ref_stub_util import install_stubs, remove_stubs

    added = install_stubs(torch)
    from src.models.modules import losses

    yield losses
    remove_stubs(added)


def test_legacy_stage1_vq_loss_parity(ref_losses):
    import torch

    import jax.numpy as jnp

    from deco_tpu.convert.torch_to_flax import convert_discriminator
    from deco_tpu.models.gan.discriminator import NLayerDiscriminator
    from deco_tpu.models.gan.legacy_losses import TiTokLoss
    from deco_tpu.models.gan.vae_loss import LeCamState

    cfg = _Cfg(
        losses=_Cfg(
            reconstruction_loss="l2", reconstruction_weight=1.0,
            quantizer_weight=1.0, perceptual_loss="lpips",
            perceptual_weight=1.1, discriminator_start=0,
            discriminator_factor=1.0, discriminator_weight=0.1,
            lecam_regularization_weight=0.001,
        ),
        model=_Cfg(vq_model=_Cfg(quantize_mode="vq")),
    )
    tloss = ref_losses.ReconstructionLoss_Stage1(cfg).eval()
    g = torch.Generator().manual_seed(12)
    with torch.no_grad():
        for p in tloss.discriminator.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.1)

    rng = np.random.RandomState(12)
    b = 2
    # stage-1 convention: inputs imagenet-normalized, recon in [-1, 1]
    raw = rng.uniform(0, 1, (b, 3, 128, 128)).astype(np.float32)
    mean = np.array([0.485, 0.456, 0.406], np.float32)[None, :, None, None]
    std = np.array([0.229, 0.224, 0.225], np.float32)[None, :, None, None]
    inputs = ((raw - mean) / std).astype(np.float32)
    recon = np.clip(raw * 2 - 1 + 0.1 * rng.randn(b, 3, 128, 128),
                    -1, 1).astype(np.float32)
    q_loss, c_loss, cb_loss = 0.37, 0.21, 0.16
    extra_t = {"quantizer_loss": torch.tensor(q_loss),
               "commitment_loss": torch.tensor(c_loss),
               "codebook_loss": torch.tensor(cb_loss)}

    with torch.no_grad():
        g_total_t, g_dict_t = tloss(
            torch.from_numpy(inputs), torch.from_numpy(recon), extra_t,
            global_step=5, mode="generator")
        d_total_t, d_dict_t = tloss(
            # discriminator mode has no denorm in Stage1 Base path; feed the
            # ALIGNED [0,1] tensors, as the lightning module does upstream
            torch.from_numpy(raw),
            torch.from_numpy((recon + 1) / 2), extra_t,
            global_step=5, mode="discriminator")

    params = convert_discriminator(
        {k: v.numpy() for k, v in tloss.discriminator.state_dict().items()})
    jdisc = NLayerDiscriminator(dtype=jnp.float32)
    disc_apply = lambda p, x: jdisc.apply({"params": p}, x)

    jloss = TiTokLoss(
        stage=1, quantize_mode="vq", reconstruction_loss="l2",
        reconstruction_weight=1.0, quantizer_weight=1.0,
        perceptual_weight=1.1, discriminator_start=0,
        discriminator_factor=1.0, discriminator_weight=0.1,
        lecam_regularization_weight=0.001,
    )
    jin = jnp.asarray(inputs.transpose(0, 2, 3, 1))
    jre = jnp.asarray(recon.transpose(0, 2, 3, 1))
    extra_j = {"quantizer_loss": jnp.float32(q_loss),
               "commitment_loss": jnp.float32(c_loss),
               "codebook_loss": jnp.float32(cb_loss)}
    g_total_j, g_dict_j = jloss.generator_loss(
        disc_apply, params, jin, jre, extra_j, global_step=5)
    d_total_j, _, d_dict_j = jloss.discriminator_loss(
        disc_apply, params, jin, jre, global_step=5,
        lecam=LeCamState.create())

    np.testing.assert_allclose(float(g_total_j), float(g_total_t),
                               rtol=1e-3, atol=1e-4)
    for k in ("reconstruction_loss", "quantizer_loss", "gan_loss",
              "weighted_gan_loss"):
        np.testing.assert_allclose(float(g_dict_j[k]), float(g_dict_t[k]),
                                   rtol=1e-3, atol=1e-4, err_msg=k)
    np.testing.assert_allclose(float(d_total_j), float(d_total_t),
                               rtol=1e-3, atol=1e-4)
    for k in ("logits_real", "logits_fake", "lecam_loss"):
        np.testing.assert_allclose(float(d_dict_j[k]), float(d_dict_t[k]),
                                   rtol=1e-3, atol=1e-4, err_msg=k)
