"""VAE-GAN reconstruction loss: recon + perceptual + adaptive hinge GAN + LeCam.

Parity with reference ``VAEReconstructionLoss``
(``src/models/modules/vae_loss.py:94-560`` of hhhhzp/DeCo), re-designed
functionally for JAX:

- generator loss: L1/L2 recon (in [0,1]) + weighted perceptual + hinge-G with
  the adaptive weight ``|grad(nll, w_last)| / (|grad(g, w_last)| + 1e-4)``
  (computed via two targeted vjp pullbacks) + optional feature distillation
  (MSE / cosine+MSE);
- discriminator loss: hinge(real, stop_grad(fake)) + LeCam regularization
  whose EMA logit means are explicit state threaded through the step (no
  mutable buffers under jit).
"""

from __future__ import annotations

from typing import Callable, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct


def hinge_d_loss(logits_real, logits_fake):
    loss_real = jnp.mean(jax.nn.relu(1.0 - logits_real))
    loss_fake = jnp.mean(jax.nn.relu(1.0 + logits_fake))
    return 0.5 * (loss_real + loss_fake)


def compute_lecam_loss(real_mean, fake_mean, ema_real_mean, ema_fake_mean):
    return jnp.mean(jax.nn.relu(real_mean - ema_fake_mean) ** 2) + jnp.mean(
        jax.nn.relu(ema_real_mean - fake_mean) ** 2
    )


@struct.dataclass
class LeCamState:
    ema_real: jnp.ndarray
    ema_fake: jnp.ndarray

    @classmethod
    def create(cls):
        return cls(ema_real=jnp.zeros(()), ema_fake=jnp.zeros(()))


class VAEGANLoss:
    """Config + pure loss functions (reference vae_loss.py:118-560)."""

    def __init__(
        self,
        reconstruction_loss: str = "l2",
        reconstruction_weight: float = 1.0,
        perceptual_weight: float = 1.1,
        discriminator_weight: float = 0.1,
        discriminator_factor: float = 1.0,
        discriminator_iter_start: int = 0,
        lecam_regularization_weight: float = 0.001,
        lecam_ema_decay: float = 0.999,
        distillation_weight: float = 0.0,
        distillation_loss_type: str = "mse",
        adaptive_weight: bool = True,
        kl_weight: float = 0.0,
        logvar_init: float = 0.0,
    ):
        # kl_weight scales the stochastic VAEModel's posterior KL (reference
        # vae_loss.py kl_weight; shipped configs use 0.0). logvar_init is the
        # reference's learnable Gaussian-NLL logvar initial value — accepted
        # for config parity; deco_tpu's NLL is plain L1/L2 like the reference
        # with logvar 0 (the shipped value).
        self.kl_weight = kl_weight
        self.logvar_init = logvar_init
        self.reconstruction_loss = reconstruction_loss
        self.reconstruction_weight = reconstruction_weight
        self.perceptual_weight = perceptual_weight
        self.discriminator_weight = discriminator_weight
        self.discriminator_factor = discriminator_factor
        self.discriminator_iter_start = discriminator_iter_start
        self.lecam_regularization_weight = lecam_regularization_weight
        self.lecam_ema_decay = lecam_ema_decay
        self.distillation_weight = distillation_weight
        self.distillation_loss_type = distillation_loss_type
        self.adaptive_weight = adaptive_weight

    def _nll(self, inputs01, recon01, perceptual_fn):
        if self.reconstruction_loss == "l1":
            rec = jnp.mean(jnp.abs(inputs01 - recon01))
        else:
            rec = jnp.mean((inputs01 - recon01) ** 2)
        rec = rec * self.reconstruction_weight
        perc = jnp.float32(0.0)
        if perceptual_fn is not None:
            perc = perceptual_fn(inputs01, recon01).mean()
        return rec, perc, rec + self.perceptual_weight * perc

    def generator_loss(
        self,
        inputs,
        reconstructions,
        disc_apply: Optional[Callable],
        global_step,
        perceptual_fn: Optional[Callable] = None,
        student_features=None,
        teacher_features=None,
        d_weight: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, Mapping]:
        """inputs/reconstructions in [-1, 1]; d_weight precomputed by
        :func:`adaptive_d_weight` (or None for the configured constant)."""
        inputs01 = inputs.astype(jnp.float32) * 0.5 + 0.5
        recon01 = reconstructions.astype(jnp.float32) * 0.5 + 0.5
        rec, perc, nll = self._nll(inputs01, recon01, perceptual_fn)

        disc_factor = jnp.where(
            global_step >= self.discriminator_iter_start,
            self.discriminator_factor, 0.0,
        )
        g_loss = jnp.float32(0.0)
        if disc_apply is not None and self.discriminator_weight > 0:
            logits_fake = disc_apply(recon01)
            g_loss = -jnp.mean(logits_fake)
        if d_weight is None:
            d_weight = jnp.float32(self.discriminator_weight)

        distill = jnp.float32(0.0)
        cos_loss = jnp.float32(0.0)
        mse_loss = jnp.float32(0.0)
        if (
            self.distillation_weight > 0
            and student_features is not None
            and teacher_features is not None
        ):
            sf = student_features.astype(jnp.float32)
            tf = jax.lax.stop_gradient(teacher_features.astype(jnp.float32))
            mse_loss = jnp.mean((sf - tf) ** 2)
            if self.distillation_loss_type == "cosine":
                sn = sf / (jnp.linalg.norm(sf, axis=-1, keepdims=True) + 1e-8)
                tn = tf / (jnp.linalg.norm(tf, axis=-1, keepdims=True) + 1e-8)
                cos_loss = 1.0 - jnp.mean(jnp.sum(sn * tn, -1))
                distill = (cos_loss + mse_loss) * self.distillation_weight
            else:
                distill = mse_loss * self.distillation_weight

        total = nll + d_weight * disc_factor * g_loss + distill
        return total, dict(
            total_loss=total,
            reconstruction_loss=rec,
            perceptual_loss=self.perceptual_weight * perc,
            gan_loss=g_loss,
            d_weight=d_weight,
            weighted_gan_loss=d_weight * disc_factor * g_loss,
            distillation_loss=distill,
            distillation_cosine_loss=cos_loss,
            mse_loss=mse_loss,
        )

    def discriminator_loss(
        self,
        inputs,
        reconstructions,
        disc_apply: Callable,
        global_step,
        lecam_state: Optional[LeCamState] = None,
    ) -> Tuple[jnp.ndarray, Mapping, Optional[LeCamState]]:
        inputs01 = inputs.astype(jnp.float32) * 0.5 + 0.5
        recon01 = jax.lax.stop_gradient(
            reconstructions.astype(jnp.float32) * 0.5 + 0.5
        )
        logits_real = disc_apply(inputs01)
        logits_fake = disc_apply(recon01)
        disc_factor = jnp.where(
            global_step >= self.discriminator_iter_start,
            self.discriminator_factor, 0.0,
        )
        d_loss = disc_factor * hinge_d_loss(logits_real, logits_fake)

        lecam = jnp.float32(0.0)
        new_state = lecam_state
        if self.lecam_regularization_weight > 0 and lecam_state is not None:
            real_mean = jnp.mean(logits_real)
            fake_mean = jnp.mean(logits_fake)
            lecam = (
                compute_lecam_loss(
                    real_mean, fake_mean, lecam_state.ema_real, lecam_state.ema_fake
                )
                * self.lecam_regularization_weight
            )
            d = self.lecam_ema_decay
            new_state = LeCamState(
                ema_real=lecam_state.ema_real * d
                + jax.lax.stop_gradient(real_mean) * (1 - d),
                ema_fake=lecam_state.ema_fake * d
                + jax.lax.stop_gradient(fake_mean) * (1 - d),
            )
        d_loss = d_loss + lecam
        return d_loss, dict(
            discriminator_loss=d_loss,
            logits_real=jnp.mean(logits_real),
            logits_fake=jnp.mean(logits_fake),
            lecam_loss=lecam,
        ), new_state


def adaptive_d_weight(nll_fn, g_fn, last_layer_params, base_weight: float):
    """|grad(nll)| / (|grad(g)| + 1e-4) * base, clipped to [0, 1e4].

    ``nll_fn``/``g_fn`` are scalar functions of the decoder's last-layer
    params (reference calculate_adaptive_weight :306-324).
    """
    nll_grads = jax.grad(nll_fn)(last_layer_params)
    g_grads = jax.grad(g_fn)(last_layer_params)
    gn = lambda t: jnp.sqrt(
        sum(jnp.sum(jnp.square(x)) for x in jax.tree.leaves(t))
    )
    w = gn(nll_grads) / (gn(g_grads) + 1e-4)
    return jax.lax.stop_gradient(jnp.clip(w, 0.0, 1e4)) * base_weight
