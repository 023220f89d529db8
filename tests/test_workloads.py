"""Config-driven UniFlow / VAE-GAN workload routing (tiny configs, 2 steps)."""

import numpy as np
import pytest
from PIL import Image

from deco_tpu.train import workloads


@pytest.fixture(scope="module")
def img_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("imgs")
    (root / "c").mkdir()
    rng = np.random.RandomState(0)
    for i in range(4):
        Image.fromarray(rng.randint(0, 255, (36, 36, 3), np.uint8)).save(
            root / "c" / f"{i}.png"
        )
    return str(root)


def test_config_detection():
    assert workloads.is_uniflow_config({"model": {"vit_hidden_size": 64}})
    assert not workloads.is_uniflow_config({"model": {"denoiser": {}}})
    assert workloads.is_vae_config({"discriminator": {}, "loss": {}})


def test_uniflow_workload(img_root, tmp_path):
    config = {
        "model": dict(
            vit_hidden_size=64, llm_hidden_size=24, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=64, patch_size=4,
            image_size=32, global_blocks_depth=1, num_decoder_layers=1,
            num_sampling_steps=2,
        ),
        "train": dict(warmup_steps=1, total_steps=4),
        "data": dict(train_root=img_root, resolution=32, batch_size=2),
    }
    state = workloads.run_uniflow(config, max_steps=2,
                                  workdir=str(tmp_path / "uf"))
    assert int(state.step) == 2


def test_vae_gan_workload(img_root, tmp_path):
    config = {
        "model": dict(
            vit=dict(hidden_size=32, num_layers=3, num_heads=4,
                     intermediate_size=64, patch_size=14, image_size=28,
                     qk_normalization=True, norm_type="rms_norm"),
            llm_hidden_size=24, latent_channel=8, gen_select_layer=2,
            # 6 decoder stages = x32 upsample: latent 1x1 (28px, patch 14,
            # shuffle x0.5) -> 32px -> x14/16 = 28px matches the input
            decoder_channels=(8, 8, 8, 8, 16, 16),
            decoder_layers=(1, 1, 1, 1, 1, 1),
            decoder_attn=(False,) * 6,
        ),
        "discriminator": dict(hidden_channels=64, num_stages=1),
        "loss": dict(reconstruction_loss="l2", perceptual_weight=0.0,
                     discriminator_weight=0.1, discriminator_iter_start=0,
                     lecam_regularization_weight=0.001),
        "optimizer": dict(gen_lr=1e-4, disc_lr=1e-4),
        "data": dict(train_root=img_root, resolution=28, batch_size=2),
    }
    state = workloads.run_vae_gan(config, max_steps=2,
                                  workdir=str(tmp_path / "vae"))
    assert int(state.step) == 2
