"""Two-optimizer VAE-GAN training step (generator + discriminator) under jit.

TPU-native equivalent of the reference's manual-optimization Lightning module
(``src/lightning_model_ae.py:314-424`` of hhhhzp/DeCo) and its
MultiModelDDPStrategy (``src/strategies/multi_model_ddp.py:41-74``): under
pjit there is nothing to toggle — generator and discriminator are separate
param trees with separate optax states updated in one compiled step, and the
DDP bookkeeping problem the custom strategy solved does not exist.

The adaptive GAN weight is computed from one shared forward via ``jax.vjp``:
three cotangent pulls give grad(nll), grad(g_loss), grad(distill) separately;
the last-layer norms of the first two produce d_weight and the total gradient
is combined linearly — matching the reference's autograd.grad(retain_graph)
dance without recomputation.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from deco_tpu.models.gan.vae_loss import LeCamState, VAEGANLoss, hinge_d_loss


@struct.dataclass
class VAEGANTrainState:
    step: jnp.ndarray
    gen_params: Any
    disc_params: Any
    gen_opt_state: Any
    disc_opt_state: Any
    lecam: LeCamState
    gen_ema_params: Any = None
    gen_tx: optax.GradientTransformation = struct.field(pytree_node=False,
                                                        default=None)
    disc_tx: optax.GradientTransformation = struct.field(pytree_node=False,
                                                         default=None)

    @classmethod
    def create(cls, gen_params, disc_params, gen_tx, disc_tx, ema: bool = False):
        import jax as _jax

        return cls(
            step=jnp.zeros((), jnp.int32),
            gen_params=gen_params,
            disc_params=disc_params,
            gen_opt_state=gen_tx.init(gen_params),
            disc_opt_state=disc_tx.init(disc_params),
            lecam=LeCamState.create(),
            # jnp.array COPIES (jnp.asarray would alias fp32 leaves and the
            # donated step would then donate the same buffer twice)
            gen_ema_params=(_jax.tree.map(
                lambda x: jnp.array(x, jnp.float32), gen_params)
                if ema else None),
            gen_tx=gen_tx,
            disc_tx=disc_tx,
        )


def make_vae_gan_step(
    vae_apply: Callable,
    disc_apply: Callable,
    loss_cfg: VAEGANLoss,
    last_layer_path: Tuple[str, ...],
    perceptual_fn: Optional[Callable] = None,
    teacher_fn: Optional[Callable] = None,
    grad_clip: float = 1.0,
    ema_decay: float = 0.9999,
    donate: bool = True,
):
    """Build the jitted G+D step.

    ``vae_apply(gen_params, x, rng) -> (recon, extra)`` where extra may carry
    ``student_features``; ``disc_apply(disc_params, img01) -> logits``;
    ``last_layer_path`` locates the decoder's output-layer subtree inside
    gen_params for the adaptive weight.
    """

    def get_last(t):
        for p in last_layer_path:
            t = t[p]
        return t

    def train_step(state: VAEGANTrainState, batch, rng):
        x = batch["x"]
        step = state.step

        # ---------------- generator ----------------
        def parts_fn(gen_params):
            recon, extra = vae_apply(gen_params, x, rng)
            inputs01 = x.astype(jnp.float32) * 0.5 + 0.5
            recon01 = recon.astype(jnp.float32) * 0.5 + 0.5
            if loss_cfg.reconstruction_loss == "l1":
                rec = jnp.mean(jnp.abs(inputs01 - recon01))
            else:
                rec = jnp.mean((inputs01 - recon01) ** 2)
            rec = rec * loss_cfg.reconstruction_weight
            perc = jnp.float32(0.0)
            if perceptual_fn is not None:
                perc = perceptual_fn(inputs01, recon01).mean()
            nll = rec + loss_cfg.perceptual_weight * perc
            kl = extra.get("kl", jnp.float32(0.0))
            if getattr(loss_cfg, "kl_weight", 0.0) > 0:
                nll = nll + loss_cfg.kl_weight * kl
            g_loss = -jnp.mean(disc_apply(state.disc_params, recon01))
            distill = jnp.float32(0.0)
            cos_l = jnp.float32(0.0)
            mse_l = jnp.float32(0.0)
            if loss_cfg.distillation_weight > 0 and teacher_fn is not None:
                sf = extra["student_features"].astype(jnp.float32)
                tf = jax.lax.stop_gradient(teacher_fn(x).astype(jnp.float32))
                mse_l = jnp.mean((sf - tf) ** 2)
                if loss_cfg.distillation_loss_type == "cosine":
                    sn = sf / (jnp.linalg.norm(sf, axis=-1, keepdims=True) + 1e-8)
                    tn = tf / (jnp.linalg.norm(tf, axis=-1, keepdims=True) + 1e-8)
                    cos_l = 1.0 - jnp.mean(jnp.sum(sn * tn, -1))
                    distill = (cos_l + mse_l) * loss_cfg.distillation_weight
                else:
                    distill = mse_l * loss_cfg.distillation_weight
            aux = dict(recon=recon, rec=rec, perc=perc, cos=cos_l, mse=mse_l,
                       kl=kl)
            return (nll, g_loss, distill), aux

        (nll, g_loss, distill), pullback, aux = jax.vjp(
            parts_fn, state.gen_params, has_aux=True
        )
        g_nll = pullback((jnp.float32(1.0), jnp.float32(0.0), jnp.float32(0.0)))[0]
        g_gan = pullback((jnp.float32(0.0), jnp.float32(1.0), jnp.float32(0.0)))[0]
        g_dis = pullback((jnp.float32(0.0), jnp.float32(0.0), jnp.float32(1.0)))[0]

        disc_factor = jnp.where(
            step >= loss_cfg.discriminator_iter_start, loss_cfg.discriminator_factor,
            0.0,
        )
        gn = lambda t: jnp.sqrt(
            sum(jnp.sum(jnp.square(l)) for l in jax.tree.leaves(t)) + 1e-12
        )
        if loss_cfg.adaptive_weight:
            d_weight = jnp.clip(
                gn(get_last(g_nll)) / (gn(get_last(g_gan)) + 1e-4), 0.0, 1e4
            ) * loss_cfg.discriminator_weight
        else:
            d_weight = jnp.float32(loss_cfg.discriminator_weight)
        d_weight = jax.lax.stop_gradient(d_weight)

        grads = jax.tree.map(
            lambda a, b, c: a + d_weight * disc_factor * b + c, g_nll, g_gan, g_dis
        )
        # grad clip (reference: clip 1.0, lightning_model_ae.py:405)
        gnorm = gn(grads)
        scale = jnp.minimum(1.0, grad_clip / (gnorm + 1e-6))
        grads = jax.tree.map(lambda g: g * scale, grads)
        updates, gen_opt_state = state.gen_tx.update(
            grads, state.gen_opt_state, state.gen_params
        )
        gen_params = optax.apply_updates(state.gen_params, updates)
        # generator EMA (reference ema_tracker on the vae model,
        # configs/vae_training.yaml:73-77) — fused tree_map, no side stream
        gen_ema = state.gen_ema_params
        if gen_ema is not None:
            gen_ema = jax.tree.map(
                lambda e, p: e * ema_decay + p.astype(e.dtype) * (1 - ema_decay),
                gen_ema, gen_params,
            )

        # ---------------- discriminator ----------------
        recon = jax.lax.stop_gradient(aux["recon"])

        def d_loss_fn(disc_params):
            inputs01 = x.astype(jnp.float32) * 0.5 + 0.5
            recon01 = recon.astype(jnp.float32) * 0.5 + 0.5
            logits_real = disc_apply(disc_params, inputs01)
            logits_fake = disc_apply(disc_params, recon01)
            d_loss = disc_factor * hinge_d_loss(logits_real, logits_fake)
            real_mean = jnp.mean(logits_real)
            fake_mean = jnp.mean(logits_fake)
            lecam = jnp.float32(0.0)
            if loss_cfg.lecam_regularization_weight > 0:
                lecam = (
                    jnp.mean(jax.nn.relu(real_mean - state.lecam.ema_fake) ** 2)
                    + jnp.mean(jax.nn.relu(state.lecam.ema_real - fake_mean) ** 2)
                ) * loss_cfg.lecam_regularization_weight
            return d_loss + lecam, (real_mean, fake_mean, lecam)

        (d_loss, (real_mean, fake_mean, lecam)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(state.disc_params)
        d_gnorm = gn(d_grads)
        d_scale = jnp.minimum(1.0, grad_clip / (d_gnorm + 1e-6))
        d_grads = jax.tree.map(lambda g: g * d_scale, d_grads)
        d_updates, disc_opt_state = state.disc_tx.update(
            d_grads, state.disc_opt_state, state.disc_params
        )
        disc_params = optax.apply_updates(state.disc_params, d_updates)

        dec = loss_cfg.lecam_ema_decay
        lecam_state = LeCamState(
            ema_real=state.lecam.ema_real * dec
            + jax.lax.stop_gradient(real_mean) * (1 - dec),
            ema_fake=state.lecam.ema_fake * dec
            + jax.lax.stop_gradient(fake_mean) * (1 - dec),
        )

        metrics = dict(
            total_loss=nll + d_weight * disc_factor * g_loss + distill,
            reconstruction_loss=aux["rec"],
            perceptual_loss=loss_cfg.perceptual_weight * aux["perc"],
            gan_loss=g_loss,
            d_weight=d_weight,
            distillation_loss=distill,
            kl_loss=aux["kl"],
            discriminator_loss=d_loss,
            logits_real=real_mean,
            logits_fake=fake_mean,
            lecam_loss=lecam,
            gen_grad_norm=gnorm,
            disc_grad_norm=d_gnorm,
        )
        new_state = state.replace(
            step=step + 1,
            gen_params=gen_params,
            disc_params=disc_params,
            gen_opt_state=gen_opt_state,
            disc_opt_state=disc_opt_state,
            lecam=lecam_state,
            gen_ema_params=gen_ema,
        )
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())
