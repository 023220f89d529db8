"""Config-driven UniFlow and VAE-GAN training workloads.

Completes the single-CLI story (SURVEY caveat 1: one CLI whose config cleanly
selects the workload): ``deco_tpu.cli fit -c configs_flow/uniflow_*.yaml`` and
``-c configs/vae_training.yaml`` route here based on the config shape.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax


def is_uniflow_config(config: Dict[str, Any]) -> bool:
    return "model" in config and "vit_hidden_size" in config.get("model", {})

def is_vae_config(config: Dict[str, Any]) -> bool:
    return "discriminator" in config and "loss" in config


def run_uniflow(config: Dict[str, Any], max_steps: Optional[int] = None,
                workdir: str = "./workdirs_uniflow"):
    from deco_tpu.data.imagenet import PixImageNet
    from deco_tpu.data.loader import make_loader
    from deco_tpu.models.uniflow import UniFlowConfig
    from deco_tpu.train.hooks import ScalarLogger
    from deco_tpu.train.uniflow_loop import UniFlowExperiment, UniFlowTrainConfig

    model_cfg = UniFlowConfig(**config["model"])
    train_cfg = UniFlowTrainConfig(**{
        k: v for k, v in config.get("train", {}).items()
        if k in UniFlowTrainConfig.__dataclass_fields__
    })
    exp = UniFlowExperiment(model_cfg, train_cfg)
    data_cfg = config.get("data", {})
    res = data_cfg.get("resolution", model_cfg.image_size)
    batch = data_cfg.get("batch_size", 8)
    dataset = PixImageNet(data_cfg["train_root"], resolution=res)
    loader = make_loader(dataset, batch, infinite=True)

    rng = jax.random.PRNGKey(0)
    state = exp.init_state(rng, jnp.zeros((batch, res, res, 3)))
    step = exp.make_train_step()
    os.makedirs(workdir, exist_ok=True)
    logger = ScalarLogger(workdir, log_every_n_steps=10)
    limit = max_steps or train_cfg.total_steps
    for bi, (bx, _, _) in enumerate(loader):
        if bi >= limit:
            break
        state, metrics = step(state, {"x": jnp.asarray(bx)},
                              jax.random.fold_in(rng, bi))
        logger.log(bi, metrics)
    logger.close()
    return state


def run_vae_gan(config: Dict[str, Any], max_steps: Optional[int] = None,
                workdir: str = "./workdirs_vae"):
    from deco_tpu.data.imagenet import PixImageNet
    from deco_tpu.data.loader import make_loader
    from deco_tpu.models.gan.discriminator import NLayerDiscriminator
    from deco_tpu.models.gan.vae_loss import VAEGANLoss
    from deco_tpu.models.perceptual import PerceptualLoss
    from deco_tpu.models.uniflow.vit import ViTConfig
    from deco_tpu.models.vae_models import VAEModel
    from deco_tpu.train.hooks import ScalarLogger
    from deco_tpu.train.vae_gan_step import VAEGANTrainState, make_vae_gan_step

    mc = config["model"]
    vit = ViTConfig(**{
        k: v for k, v in mc.get("vit", {}).items()
        if k in ViTConfig.__dataclass_fields__
    })
    vae_kw = dict(
        vit=vit, llm_hidden_size=mc.get("llm_hidden_size", 1536),
        latent_channel=mc.get("latent_channel", 32),
        gen_select_layer=mc.get("gen_select_layer", 18),
    )
    for k in ("decoder_channels", "decoder_layers", "decoder_attn"):
        if k in mc:
            vae_kw[k] = tuple(mc[k])
    vae = VAEModel(**vae_kw)
    disc = NLayerDiscriminator(**config.get("discriminator", {}))
    loss_keys = ("reconstruction_loss", "reconstruction_weight",
                 "perceptual_weight", "discriminator_weight",
                 "discriminator_factor", "discriminator_iter_start",
                 "lecam_regularization_weight", "distillation_weight",
                 "distillation_loss_type")
    loss_cfg = VAEGANLoss(**{
        k: v for k, v in config.get("loss", {}).items() if k in loss_keys
    })
    perceptual = None
    pmodel = config.get("loss", {}).get("perceptual_model")
    if pmodel:
        perceptual = PerceptualLoss(pmodel)

    data_cfg = config.get("data", {})
    res = data_cfg.get("resolution", vit.image_size)
    batch = data_cfg.get("batch_size", 4)
    dataset = PixImageNet(data_cfg["train_root"], resolution=res)
    loader = make_loader(dataset, batch, infinite=True)

    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((batch, res, res, 3))
    gen_params = vae.init(rng, x0)["params"]
    disc_params = disc.init(jax.random.fold_in(rng, 1), x0)["params"]
    opt_cfg = config.get("optimizer", {})
    state = VAEGANTrainState.create(
        gen_params, disc_params,
        optax.adamw(opt_cfg.get("gen_lr", 1e-4)),
        optax.adamw(opt_cfg.get("disc_lr", 1e-4)),
    )
    step = make_vae_gan_step(
        vae_apply=lambda p, x, r: vae.apply({"params": p}, x, r),
        disc_apply=lambda p, img: disc.apply({"params": p}, img),
        loss_cfg=loss_cfg,
        # adaptive weight on the DC-AE decoder's output conv
        last_layer_path=("decoder", "conv_out"),
        perceptual_fn=perceptual,
        grad_clip=config.get("optimizer", {}).get("grad_clip", 1.0),
    )
    os.makedirs(workdir, exist_ok=True)
    logger = ScalarLogger(workdir, log_every_n_steps=10)
    limit = max_steps or 100
    for bi, (bx, _, _) in enumerate(loader):
        if bi >= limit:
            break
        state, metrics = step(state, {"x": jnp.asarray(bx)},
                              jax.random.fold_in(rng, bi))
        logger.log(bi, metrics)
    logger.close()
    return state
