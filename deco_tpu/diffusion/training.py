"""Diffusion training objectives as pure loss functions.

Parity with the reference trainer hierarchy (hhhhzp/DeCo):

- :class:`FlowMatchingTrainer` — ``src/diffusion/flow_matching/training.py:20-60``
- :class:`DeCoTrainer`        — ``src/diffusion/flow_matching/training_repa_DeCo.py:43-294``
  (the c2i/t2i production objective: mixed lognorm/uniform timesteps, timeshift,
  velocity MSE; the paper's 8x8 block-DCT frequency-weighted loss is first-class
  and switchable here — the reference ships it implemented but commented out)
- :class:`JiTTrainer`         — ``training_repa_JiT.py`` (x-prediction)
- :class:`VPTrainer` / :class:`DDPMTrainer` — ``src/diffusion/ddpm/training.py:17-95``

TPU-native design: each trainer is a pure function of ``(rng, net, batch)``
suitable for ``jax.value_and_grad`` inside a pjit-ed train step. Randomness
(CFG label dropout, timestep draw, interpolation noise) is derived from the
single ``rng`` via explicit splits; there is no hidden state. bf16 policy lives
in the model (params fp32 / compute bf16), not in an autocast wrapper.
"""

from __future__ import annotations

from typing import Callable, Union

import jax
import jax.numpy as jnp

from deco_tpu.diffusion.scheduling import BaseScheduler, bcast_right
from deco_tpu.ops import block_dct


# loss weight functions (reference flow_matching/training.py:6-15)
def inverse_sigma(alpha, sigma):
    return 1 / sigma**2


def snr(alpha, sigma):
    return alpha / sigma


def minsnr(alpha, sigma, threshold=5):
    return jnp.clip(alpha / sigma, min=threshold)


def maxsnr(alpha, sigma, threshold=5):
    return jnp.clip(alpha / sigma, max=threshold)


def constant(alpha, sigma):
    return 1.0


LOSS_WEIGHT_FNS = {
    "inverse_sigma": inverse_sigma,
    "snr": snr,
    "minsnr": minsnr,
    "maxsnr": maxsnr,
    "constant": constant,
}


def time_shift_fn(t, timeshift=1.0):
    return t / (t + (1 - t) * timeshift)


def _resolve_weight_fn(fn: Union[str, Callable]) -> Callable:
    if isinstance(fn, str):
        return LOSS_WEIGHT_FNS[fn]
    return fn


class BaseTrainer:
    """CFG label dropout + dispatch (reference base/training.py:7-28)."""

    # metadata array keys this objective consumes from the batch pipeline;
    # Experiment.fit forwards exactly these into the jitted step (the
    # reference passes the whole metadata dict, lightning_model.py:228-236,
    # but filenames/save_fn closures can't cross the jit boundary)
    metadata_keys: tuple = ()

    def __init__(self, null_condition_p: float = 0.1):
        self.null_condition_p = null_condition_p

    def preprocess(self, rng, x, condition, uncondition):
        if self.null_condition_p > 0:
            bsz = x.shape[0]
            mask = jax.random.uniform(rng, (bsz,)) < self.null_condition_p
            mask = jnp.reshape(mask, (-1,) + (1,) * (condition.ndim - 1))
            condition = jnp.where(mask, uncondition, condition)
        return x, condition

    def init_params(self, rng):
        """Trainable trainer-owned params (e.g. the REPA projection); {} if none."""
        return {}

    def _impl_trainstep(self, rng, net, x, y, metadata=None, params=None):
        raise NotImplementedError

    def __call__(self, rng, net, x, condition, uncondition, metadata=None,
                 params=None):
        rng_drop, rng_step = jax.random.split(rng)
        x, condition = self.preprocess(rng_drop, x, condition, uncondition)
        return self._impl_trainstep(rng_step, net, x, condition, metadata,
                                    params=params)


class FlowMatchingTrainer(BaseTrainer):
    """Plain velocity-matching objective."""

    def __init__(
        self,
        scheduler: BaseScheduler,
        loss_weight_fn: Union[str, Callable] = "constant",
        lognorm_t: bool = False,
        timeshift: float = 1.0,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.scheduler = scheduler
        self.loss_weight_fn = _resolve_weight_fn(loss_weight_fn)
        self.lognorm_t = lognorm_t
        self.timeshift = timeshift

    def _sample_t(self, rng, batch_size):
        if self.lognorm_t:
            t = jax.nn.sigmoid(jax.random.normal(rng, (batch_size,)))
        else:
            t = jax.random.uniform(rng, (batch_size,))
        return time_shift_fn(t, self.timeshift)

    def _impl_trainstep(self, rng, net, x, y, metadata=None, params=None):
        rng_t, rng_noise = jax.random.split(rng)
        batch_size = x.shape[0]
        t = self._sample_t(rng_t, batch_size)
        noise = jax.random.normal(rng_noise, x.shape, x.dtype)
        alpha, dalpha, sigma, dsigma = (
            bcast_right(c, x.ndim) for c in self.scheduler.isotropic_coeffs(t)
        )
        x_t = alpha * x + noise * sigma
        v_t = dalpha * x + dsigma * noise
        out = net(x_t, t, y)
        weight = self.loss_weight_fn(alpha, sigma)
        loss = weight * (out.astype(jnp.float32) - v_t.astype(jnp.float32)) ** 2
        return dict(loss=loss.mean())


class DeCoTrainer(BaseTrainer):
    """The DeCo production objective (reference training_repa_DeCo.REPATrainer).

    Timestep distribution mixes 90% sigmoid(randn) with 10% uniform
    (:221-229); velocity MSE (:273-287); the 8x8 block-DCT frequency-weighted
    flow-matching loss (:116-195, the paper's headline loss, shipped disabled)
    is enabled with ``enable_freq_loss=True`` and runs through the fused
    Pallas/XLA kernel in :mod:`deco_tpu.ops.block_dct`.
    """

    def __init__(
        self,
        scheduler: BaseScheduler,
        loss_weight_fn: Union[str, Callable] = "constant",
        # every reference FM-family trainer defaults lognorm_t=False
        # (training.py:25, training_repa.py:35, training_repa_DeCo.py:49,
        # training_repa_JiT.py:35); the shipped configs enable it explicitly
        lognorm_t: bool = False,
        timeshift: float = 1.0,
        lognorm_mix_p: float = 0.9,
        feat_loss_weight: float = 0.5,
        encoder=None,
        align_layer: int = 8,
        proj_denoiser_dim: int = 256,
        proj_hidden_dim: int = 256,
        proj_encoder_dim: int = 256,
        freq_loss_weight: float = 1.0,
        freq_quality: int = 85,
        freq_mode: str = "inv_gamma",
        freq_gamma: float = 1.0,
        enable_freq_loss: bool = False,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.scheduler = scheduler
        self.loss_weight_fn = _resolve_weight_fn(loss_weight_fn)
        self.lognorm_t = lognorm_t
        self.timeshift = timeshift
        self.lognorm_mix_p = lognorm_mix_p
        self.feat_loss_weight = feat_loss_weight
        self.encoder = encoder
        self.align_layer = align_layer
        self.freq_loss_weight = freq_loss_weight
        self.enable_freq_loss = enable_freq_loss
        self.freq_w = block_dct.build_freq_weight(
            quality=freq_quality, mode=freq_mode, gamma=freq_gamma
        )

    def _impl_trainstep(self, rng, net, x, y, metadata=None, params=None):
        rng_nt, rng_u, rng_mix, rng_noise = jax.random.split(rng, 4)
        batch_size = x.shape[0]
        t_lognorm = jax.nn.sigmoid(jax.random.normal(rng_nt, (batch_size,)))
        t_uniform = jax.random.uniform(rng_u, (batch_size,))
        base_t = jnp.where(
            jax.random.uniform(rng_mix, (batch_size,)) <= self.lognorm_mix_p,
            t_lognorm,
            t_uniform,
        )
        t = time_shift_fn(base_t, self.timeshift)
        noise = jax.random.normal(rng_noise, x.shape, x.dtype)
        alpha, dalpha, sigma, dsigma = (
            bcast_right(c, x.ndim) for c in self.scheduler.isotropic_coeffs(t)
        )
        x_t = alpha * x + noise * sigma
        v_t = dalpha * x + dsigma * noise

        out = net(x_t, t, y)
        weight = self.loss_weight_fn(alpha, sigma)
        fm_loss = (
            weight * (out.astype(jnp.float32) - v_t.astype(jnp.float32)) ** 2
        ).mean()
        losses = dict(fm_loss=fm_loss, loss=fm_loss)

        if self.enable_freq_loss:
            # DCT/YCbCr are linear: transform the difference once.
            diff = out.astype(jnp.float32) - v_t.astype(jnp.float32)
            freq_loss = block_dct.frequency_weighted_mse(diff, self.freq_w)
            losses["fm_loss_freq"] = freq_loss
            losses["loss"] = losses["loss"] + self.freq_loss_weight * freq_loss
        return losses


class _REPAProj(object):
    """3-layer SiLU projection MLP (reference training_repa.py:55-63).

    Defined lazily to keep flax out of the module import path for the pure
    math users.
    """

    def __new__(cls, hidden_dim, out_dim):
        from flax import linen as nn

        class Proj(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = nn.Dense(hidden_dim, name="fc0")(x)
                x = nn.silu(x)
                x = nn.Dense(hidden_dim, name="fc1")(x)
                x = nn.silu(x)
                return nn.Dense(out_dim, name="fc2")(x)

        return Proj()


def _cos_align_loss(proj, proj_params, feat, metadata, encoder):
    """REPA cosine-alignment term (training_repa.py:93-104).

    ``proj(feat)`` (the denoiser tap through the trainable 3-layer MLP) vs a
    stop-gradient encoder feature of the raw image; src is truncated to the
    dst token count when they differ (:99-100, the reference keeps the
    leading tokens). Returns 0.0 when no target features are available.
    """
    src_feature = proj.apply({"params": proj_params}, feat)
    dst_feature = None
    if metadata is not None and "repa_features" in metadata:
        dst_feature = jax.lax.stop_gradient(metadata["repa_features"])
    elif encoder is not None and metadata is not None \
            and metadata.get("raw_image") is not None:
        raw = metadata["raw_image"]  # (B, H, W, 3) in [0,1]
        dst_feature = jax.lax.stop_gradient(encoder(raw))
    if dst_feature is None:
        return jnp.float32(0.0)
    n = dst_feature.shape[1]
    if src_feature.shape[1] != n:
        src_feature = src_feature[:, :n]
    sf = src_feature.astype(jnp.float32)
    df = dst_feature.astype(jnp.float32)
    # Safe norms: sqrt(x) has a NaN gradient at x==0, and an all-zero tap
    # (e.g. a model built without align_layer wired) would poison every
    # gradient. +1e-24 inside the sqrt shifts the forward by <1e-12 relative
    # at any realistic feature scale while keeping d/dx finite at 0.
    sn = jnp.sqrt(jnp.sum(sf * sf, -1) + 1e-24)
    dn = jnp.sqrt(jnp.sum(df * df, -1) + 1e-24)
    cos = jnp.sum(sf * df, -1) / (sn * dn + 1e-8)
    return (1 - cos).mean()


class REPATrainer(DeCoTrainer):
    """REPA feature-alignment trainer (reference training_repa.py:29-121).

    FM velocity loss + cosine-similarity alignment between a projected
    denoiser feature (tapped at DiT block ``align_layer``) and frozen-encoder
    features of the raw image. The projection MLP is trainer-owned trainable
    state (``init_params``), mirroring the reference's trainer ``state_dict``.

    The frozen encoder runs in-graph when ``encoder`` is a jax callable
    ``(B, H, W, 3) in [0,1] -> (B, N, D)``; alternatively the input pipeline
    precomputes features into ``metadata['repa_features']`` (the idiomatic TPU
    layout for torch-hub encoders that can't trace into XLA).
    """

    metadata_keys = ("repa_features", "raw_image")

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self._proj = _REPAProj(kwargs.get("proj_hidden_dim", 256),
                               kwargs.get("proj_encoder_dim", 256))
        self._proj_in_dim = kwargs.get("proj_denoiser_dim", 256)

    def init_params(self, rng):
        return self._proj.init(rng, jnp.zeros((1, 1, self._proj_in_dim)))[
            "params"
        ]

    def _impl_trainstep(self, rng, net, x, y, metadata=None, params=None):
        rng_t, rng_noise = jax.random.split(rng)
        batch_size = x.shape[0]
        # Pure lognorm/uniform draw (training_repa.py:68-71) — the 90/10 mix
        # belongs to the DeCo trainer only (training_repa_DeCo.py:221-229).
        if self.lognorm_t:
            base_t = jax.nn.sigmoid(jax.random.normal(rng_t, (batch_size,)))
        else:
            base_t = jax.random.uniform(rng_t, (batch_size,))
        t = time_shift_fn(base_t, self.timeshift)
        noise = jax.random.normal(rng_noise, x.shape, x.dtype)
        alpha, dalpha, sigma, dsigma = (
            bcast_right(c, x.ndim) for c in self.scheduler.isotropic_coeffs(t)
        )
        x_t = alpha * x + noise * sigma
        v_t = dalpha * x + dsigma * noise

        out, feat = net(x_t, t, y, return_features=True)
        losses = {}
        cos_loss = _cos_align_loss(
            self._proj, params, feat, metadata, self.encoder
        )

        weight = self.loss_weight_fn(alpha, sigma)
        fm_loss = (
            weight * (out.astype(jnp.float32) - v_t.astype(jnp.float32)) ** 2
        ).mean()
        total = fm_loss + self.feat_loss_weight * cos_loss
        losses.update(fm_loss=fm_loss, cos_loss=cos_loss, loss=total)
        if self.enable_freq_loss:
            diff = out.astype(jnp.float32) - v_t.astype(jnp.float32)
            freq_loss = block_dct.frequency_weighted_mse(diff, self.freq_w)
            losses["fm_loss_freq"] = freq_loss
            losses["loss"] = losses["loss"] + self.freq_loss_weight * freq_loss
        return losses


class JiTTrainer(BaseTrainer):
    """x-prediction flow matching + REPA (reference training_repa_JiT.py).

    The network predicts x1 directly; both the prediction and the target are
    converted to velocity by dividing by ``max(1 - t, t_eps)`` before the MSE
    (:82,102 — the clamp caps the near-t=1 amplification at 1/t_eps), so the
    effective x-space loss carries a ``1/(1-t)^2`` weighting. The REPA
    cosine-alignment branch is ACTIVE upstream (the shipped
    Baseline_DiT_JiT.yaml passes a DINOv2 encoder), so it is implemented here
    exactly as in :class:`REPATrainer`.
    """

    metadata_keys = ("repa_features", "raw_image")

    def __init__(
        self,
        scheduler: BaseScheduler,
        loss_weight_fn: Union[str, Callable] = "constant",
        # every reference FM-family trainer defaults lognorm_t=False
        # (training.py:25, training_repa.py:35, training_repa_DeCo.py:49,
        # training_repa_JiT.py:35); the shipped configs enable it explicitly
        lognorm_t: bool = False,
        timeshift: float = 1.0,
        encoder=None,
        align_layer: int = 8,
        proj_denoiser_dim: int = 256,
        proj_hidden_dim: int = 256,
        proj_encoder_dim: int = 256,
        feat_loss_weight: float = 0.5,
        t_eps: float = 5e-2,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.scheduler = scheduler
        self.loss_weight_fn = _resolve_weight_fn(loss_weight_fn)
        self.lognorm_t = lognorm_t
        self.timeshift = timeshift
        self.encoder = encoder
        self.align_layer = align_layer
        self.feat_loss_weight = feat_loss_weight
        self.t_eps = t_eps
        self._proj = _REPAProj(proj_hidden_dim, proj_encoder_dim)
        self._proj_in_dim = proj_denoiser_dim

    def init_params(self, rng):
        return self._proj.init(rng, jnp.zeros((1, 1, self._proj_in_dim)))[
            "params"
        ]

    def _impl_trainstep(self, rng, net, x, y, metadata=None, params=None):
        rng_t, rng_noise = jax.random.split(rng)
        batch_size = x.shape[0]
        if self.lognorm_t:
            base_t = jax.nn.sigmoid(jax.random.normal(rng_t, (batch_size,)))
        else:
            base_t = jax.random.uniform(rng_t, (batch_size,))
        t = time_shift_fn(base_t, self.timeshift)
        noise = jax.random.normal(rng_noise, x.shape, x.dtype)
        alpha, dalpha, sigma, dsigma = (
            bcast_right(c, x.ndim) for c in self.scheduler.isotropic_coeffs(t)
        )
        x_t = alpha * x + noise * sigma
        denom = jnp.clip(1.0 - bcast_right(t, x.ndim), min=self.t_eps)
        v_t = (x.astype(jnp.float32) - x_t.astype(jnp.float32)) / denom

        if params is not None:
            out, feat = net(x_t, t, y, return_features=True)
            cos_loss = _cos_align_loss(
                self._proj, params, feat, metadata, self.encoder
            )
        else:
            out = net(x_t, t, y)
            cos_loss = jnp.float32(0.0)
        out_v = (out.astype(jnp.float32) - x_t.astype(jnp.float32)) / denom

        weight = self.loss_weight_fn(alpha, sigma)
        fm_loss = (weight * (out_v - v_t) ** 2).mean()
        return dict(
            fm_loss=fm_loss,
            cos_loss=cos_loss,
            loss=fm_loss + self.feat_loss_weight * cos_loss,
        )


class VPTrainer(BaseTrainer):
    """eps-prediction VP trainer (reference ddpm/training.py:17-49)."""

    def __init__(
        self,
        scheduler: BaseScheduler,
        loss_weight_fn: Union[str, Callable] = "constant",
        train_max_t: int = 1000,
        lognorm_t: bool = False,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.scheduler = scheduler
        self.loss_weight_fn = _resolve_weight_fn(loss_weight_fn)
        self.train_max_t = train_max_t
        self.lognorm_t = lognorm_t

    def _impl_trainstep(self, rng, net, x, y, metadata=None, params=None):
        rng_t, rng_noise = jax.random.split(rng)
        batch_size = x.shape[0]
        if self.lognorm_t:
            t = jax.nn.sigmoid(jax.random.normal(rng_t, (batch_size,)))
        else:
            t = jax.random.uniform(rng_t, (batch_size,))
        noise = jax.random.normal(rng_noise, x.shape, x.dtype)
        alpha = bcast_right(self.scheduler.alpha(t), x.ndim)
        sigma = bcast_right(self.scheduler.sigma(t), x.ndim)
        x_t = alpha * x + noise * sigma
        out = net(x_t, t * self.train_max_t, y)
        weight = self.loss_weight_fn(alpha, sigma)
        loss = weight * (out.astype(jnp.float32) - noise.astype(jnp.float32)) ** 2
        return dict(loss=loss.mean())


class DDPMTrainer(BaseTrainer):
    """Discrete-t eps-prediction trainer (reference ddpm/training.py:52-95)."""

    def __init__(
        self,
        scheduler: BaseScheduler,
        loss_weight_fn: Union[str, Callable] = "constant",
        train_max_t: int = 1000,
        **kwargs,
    ):
        super().__init__(**kwargs)
        self.scheduler = scheduler
        self.loss_weight_fn = _resolve_weight_fn(loss_weight_fn)
        self.train_max_t = train_max_t

    def _impl_trainstep(self, rng, net, x, y, metadata=None, params=None):
        rng_t, rng_noise = jax.random.split(rng)
        batch_size = x.shape[0]
        t = jax.random.randint(rng_t, (batch_size,), 0, self.train_max_t)
        noise = jax.random.normal(rng_noise, x.shape, x.dtype)
        alpha = bcast_right(self.scheduler.alpha(t), x.ndim)
        sigma = bcast_right(self.scheduler.sigma(t), x.ndim)
        x_t = alpha * x + noise * sigma
        out = net(x_t, t.astype(x.dtype), y)
        weight = self.loss_weight_fn(alpha, sigma)
        loss = weight * (out.astype(jnp.float32) - noise.astype(jnp.float32)) ** 2
        return dict(loss=loss.mean())
