"""Legacy TiTok reconstruction losses (VQ + fixed-logvar VAE modes).

TPU-native port of the reference's legacy loss module
(``src/models/modules/losses.py:67-468`` of hhhhzp/DeCo): the
``ReconstructionLoss_Base`` / ``_Stage1`` / ``_Stage2`` family used by the
TiTok-style tokenizer training stages. No shipped reference config references
these classes (they predate ``vae_loss.VAEReconstructionLoss``), but they are
part of the reference surface, so the math is kept callable here.

Differences from the production :mod:`deco_tpu.models.gan.vae_loss`:

* ``quantize_mode="vq"`` composes a quantizer loss (codebook + commitment)
  from the tokenizer's ``extra_result_dict`` (losses.py:157-160);
* ``quantize_mode="vae"`` divides the reconstruction loss by a FIXED
  ``exp(logvar)`` (losses.py:303 — the parameter is created with
  ``requires_grad=False``) and adds ``kl_weight * posterior_kl``;
* Stage-1/2 inputs arrive imagenet-normalized while reconstructions are in
  [-1, 1]; both are aligned to [0, 1] before any loss (losses.py:245-254);
* no adaptive discriminator weight — ``d_weight`` is the static
  ``discriminator_weight`` (losses.py:152).

Everything is a pure function over explicit state (LeCam EMA means ride in
:class:`~deco_tpu.models.gan.vae_loss.LeCamState`), so the whole G+D step
stays jittable; the torch version's ``requires_grad`` toggling has no
equivalent under ``jax.grad``.
"""

from __future__ import annotations

from typing import Callable, Mapping, Optional, Tuple

import jax.numpy as jnp

from deco_tpu.models.gan.vae_loss import (LeCamState, compute_lecam_loss,
                                          hinge_d_loss)

# imagenet statistics used by the stage-1/2 denorm (losses.py:246-247), NHWC
_IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406])
_IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225])


def _align01(inputs, reconstructions, stage: int):
    """Stage>=1: inputs are imagenet-normalized, recons in [-1,1]; align both
    to [0,1] (losses.py:245-254). Stage 0 (Base): both already in [0,1]."""
    if stage >= 1:
        inputs = inputs * _IMAGENET_STD + _IMAGENET_MEAN
        reconstructions = (reconstructions + 1.0) / 2.0
    return inputs, reconstructions


class TiTokLoss:
    """Config + pure loss fns for the legacy TiTok GAN training stages.

    ``stage``: 0 = Base (VQ only, [0,1] inputs), 1 = Stage1 (adds vae mode +
    denorm), 2 = Stage2 (adds distillation). ``quantize_mode``: "vq" | "vae".
    """

    def __init__(
        self,
        stage: int = 1,
        quantize_mode: str = "vq",
        reconstruction_loss: str = "l2",
        reconstruction_weight: float = 1.0,
        quantizer_weight: float = 1.0,
        perceptual_weight: float = 1.0,
        discriminator_start: int = 0,
        discriminator_factor: float = 1.0,
        discriminator_weight: float = 0.1,
        lecam_regularization_weight: float = 0.0,
        lecam_ema_decay: float = 0.999,
        kl_weight: float = 1e-6,
        logvar_init: float = 0.0,
        distill_weight: float = 0.0,
    ):
        if stage == 0 and quantize_mode != "vq":
            raise ValueError("Base stage supports only quantize_mode='vq'")
        self.stage = stage
        self.quantize_mode = quantize_mode
        self.reconstruction_loss = reconstruction_loss
        self.reconstruction_weight = reconstruction_weight
        self.quantizer_weight = quantizer_weight
        self.perceptual_weight = perceptual_weight
        self.discriminator_start = discriminator_start
        self.discriminator_factor = discriminator_factor
        self.discriminator_weight = discriminator_weight
        self.lecam_regularization_weight = lecam_regularization_weight
        self.lecam_ema_decay = lecam_ema_decay
        self.kl_weight = kl_weight
        self.logvar = logvar_init  # fixed (requires_grad=False, losses.py:233)
        self.distill_weight = distill_weight

    # -- helpers --

    def _d_factor(self, global_step):
        """discriminator_factor gate as a traced value (losses.py:118-119:
        ``global_step >= discriminator_iter_start``)."""
        return jnp.where(global_step >= self.discriminator_start,
                         self.discriminator_factor, 0.0)

    def _rec(self, inputs, reconstructions):
        if self.reconstruction_loss == "l1":
            return jnp.abs(inputs - reconstructions).mean()
        if self.reconstruction_loss == "l2":
            return ((inputs - reconstructions) ** 2).mean()
        raise ValueError(self.reconstruction_loss)

    # -- generator --

    def generator_loss(
        self,
        disc_apply: Callable,
        disc_params,
        inputs,
        reconstructions,
        extra_result_dict: Mapping[str, jnp.ndarray],
        global_step,
        perceptual_fn: Optional[Callable] = None,
        distill_fn: Optional[Callable] = None,
    ) -> Tuple[jnp.ndarray, dict]:
        """Generator objective (losses.py:121-175 base, :235-330 stage1,
        :342-418 stage2). ``extra_result_dict`` carries the tokenizer's
        auxiliary terms: vq mode wants ``quantizer_loss`` (+ optionally
        ``commitment_loss``/``codebook_loss`` for logging), vae mode wants
        ``kl`` (already per-batch-mean), stage2 wants ``distill_feat``."""
        inputs, reconstructions = _align01(inputs, reconstructions, self.stage)
        rec = self._rec(inputs, reconstructions) * self.reconstruction_weight

        perc = jnp.float32(0.0)
        if perceptual_fn is not None:
            perc = perceptual_fn(inputs, reconstructions).mean()

        d_factor = self._d_factor(global_step)
        # static weight; no adaptive balancing in the legacy module
        d_weight = self.discriminator_weight
        gan = -jnp.mean(disc_apply(disc_params, reconstructions))

        distill = jnp.float32(0.0)
        if self.stage >= 2 and distill_fn is not None:
            distill = distill_fn(inputs, extra_result_dict["distill_feat"])

        metrics = dict(
            reconstruction_loss=rec,
            perceptual_loss=self.perceptual_weight * perc,
            gan_loss=gan,
            weighted_gan_loss=d_weight * d_factor * gan,
            discriminator_factor=d_factor,
            d_weight=jnp.float32(d_weight),
        )
        if self.quantize_mode == "vq":
            q = extra_result_dict["quantizer_loss"]
            total = (rec + self.perceptual_weight * perc
                     + self.quantizer_weight * q
                     + d_weight * d_factor * gan)
            metrics.update(
                quantizer_loss=self.quantizer_weight * q,
                commitment_loss=extra_result_dict.get(
                    "commitment_loss", jnp.float32(0.0)),
                codebook_loss=extra_result_dict.get(
                    "codebook_loss", jnp.float32(0.0)),
            )
        else:  # vae: fixed-logvar NLL + posterior KL (losses.py:301-317)
            rec = rec / jnp.exp(jnp.float32(self.logvar))
            kl = (extra_result_dict.get("kl", jnp.float32(0.0))
                  if self.kl_weight > 0.0 else jnp.float32(0.0))
            total = (rec + self.perceptual_weight * perc
                     + self.kl_weight * kl
                     + d_weight * d_factor * gan)
            metrics.update(reconstruction_loss=rec,
                           kl_loss=self.kl_weight * kl)
        if self.stage >= 2:
            total = total + self.distill_weight * distill
            metrics.update(distill_loss=self.distill_weight * distill)
        metrics.update(total_loss=total)
        return total, metrics

    # -- discriminator --

    def discriminator_loss(
        self,
        disc_apply: Callable,
        disc_params,
        inputs,
        reconstructions,
        global_step,
        lecam: LeCamState,
    ) -> Tuple[jnp.ndarray, LeCamState, dict]:
        """Discriminator objective + LeCam EMA advance (losses.py:177-217;
        stage2 repeats it with the denorm, :420-468). Call under
        ``stop_gradient`` on the generator outputs."""
        inputs, reconstructions = _align01(inputs, reconstructions, self.stage)
        d_factor = self._d_factor(global_step)
        logits_real = disc_apply(disc_params, inputs)
        logits_fake = disc_apply(disc_params, reconstructions)
        d_loss = d_factor * hinge_d_loss(logits_real, logits_fake)

        real_mean = jnp.mean(logits_real)
        fake_mean = jnp.mean(logits_fake)
        lecam_loss = jnp.float32(0.0)
        if self.lecam_regularization_weight > 0.0:
            lecam_loss = compute_lecam_loss(
                real_mean, fake_mean, lecam.ema_real, lecam.ema_fake
            ) * self.lecam_regularization_weight
            d = self.lecam_ema_decay
            lecam = LeCamState(
                ema_real=lecam.ema_real * d + real_mean * (1 - d),
                ema_fake=lecam.ema_fake * d + fake_mean * (1 - d),
            )
        d_loss = d_loss + lecam_loss
        return d_loss, lecam, dict(
            discriminator_loss=d_loss,
            logits_real=real_mean,
            logits_fake=fake_mean,
            lecam_loss=lecam_loss,
        )
