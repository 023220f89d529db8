"""UniFlow training/eval orchestration.

TPU-native equivalent of the reference's ``LightningUniFlowModel``
(``src/lightning_uniflow_model.py:45-564`` of hhhhzp/DeCo):

- builds :class:`UniFlowVision` from config (the HF config.json surface),
  EMA copy, optional frozen teacher (InternVL feature extractor) providing
  ``vit_embeds``/``vit_embeds_mlp`` for distillation (:523-564);
- freeze flags ``frozen_encoder``/``frozen_mlp`` (:224-275) via masked
  optimizer updates;
- param groups: vision-encoder LR 1e-5 vs default, cosine-with-min-lr
  warmup 10k / 200k steps / min 1e-5 (:283-346);
- train step = jitted forward_loss + grad + update + EMA;
- reconstruct: pad H,W to multiples of 28, run pixel/semantic
  reconstruction, unpad (:405-474).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from deco_tpu.models.uniflow import UniFlowConfig, UniFlowVision
from deco_tpu.train.schedules import adamw_with_groups, cosine_with_min_lr
from deco_tpu.train.state import TrainState, ema_update


@dataclasses.dataclass
class UniFlowTrainConfig:
    lr: float = 1e-4
    vision_lr: float = 1e-5
    warmup_steps: int = 10000
    total_steps: int = 200000
    min_lr: float = 1e-5
    weight_decay: float = 0.0
    betas: tuple = (0.9, 0.95)
    use_ema: bool = True
    ema_decay: float = 0.9999
    frozen_encoder: bool = False
    frozen_mlp: bool = False
    grad_clip: float = 1.0


class UniFlowExperiment:
    def __init__(self, model_cfg: UniFlowConfig = UniFlowConfig(),
                 train_cfg: UniFlowTrainConfig = UniFlowTrainConfig(),
                 teacher_fn: Optional[Callable] = None,
                 lpips_fn: Optional[Callable] = None,
                 dtype=jnp.bfloat16):
        self.model = UniFlowVision(model_cfg, dtype=dtype)
        self.cfg = train_cfg
        self.teacher_fn = teacher_fn
        self.lpips_fn = lpips_fn

    def init_state(self, rng, sample_x) -> TrainState:
        # jitted + cached: one compile instead of thousands of eager
        # dispatches, and repeat inits (resume templates) are free
        if not hasattr(self, "_init_fn"):
            self._init_fn = jax.jit(lambda r, x: self.model.init(
                {"params": r}, x, r, method=self.model.forward_loss))
        params = self._init_fn(rng, sample_x)
        sched = lambda lr: cosine_with_min_lr(
            lr, self.cfg.warmup_steps, self.cfg.total_steps, self.cfg.min_lr
        )
        frozen = []
        if self.cfg.frozen_encoder:
            frozen += ["params/vision", "params/shallow"]
        if self.cfg.frozen_mlp:
            frozen += ["params/mlp1_norm", "params/mlp1_fc1", "params/mlp1_fc2"]
        tx = adamw_with_groups(
            self.cfg.lr,
            group_prefixes=("vision", "shallow", "mlp1"),
            group_lr=self.cfg.vision_lr,
            weight_decay=self.cfg.weight_decay,
            betas=tuple(self.cfg.betas),
            schedule_fn=sched,
        )
        if frozen:
            from deco_tpu.train.freeze import with_frozen

            tx = with_frozen(tx, params, frozen)
        return TrainState.create(params, tx, ema=self.cfg.use_ema)

    def make_train_step(self, donate: bool = True):
        # cached: repeat fits (resume) reuse the compiled step
        key = ("_step_fn", donate)
        cached = getattr(self, "_step_cache", {}).get(key)
        if cached is not None:
            return cached
        cfg = self.cfg

        def loss_fn(params, x, rng, teacher_feat):
            losses = self.model.apply(
                params, x, rng, teacher_feat=teacher_feat,
                lpips_fn=self.lpips_fn, method=self.model.forward_loss,
            )
            return losses["loss"], losses

        def step(state: TrainState, batch, rng):
            x = batch["x"]
            teacher_feat = batch.get("teacher_feat")
            (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, x, rng, teacher_feat
            )
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, cfg.grad_clip / (gnorm + 1e-6))
            grads = jax.tree.map(lambda g: g * scale, grads)
            updates, opt_state = state.tx.update(grads, state.opt_state,
                                                 state.params)
            params = optax.apply_updates(state.params, updates)
            ema = (ema_update(state.ema_params, params, cfg.ema_decay)
                   if state.ema_params is not None else None)
            metrics = dict(metrics, grad_norm=gnorm)
            return state.replace(
                step=state.step + 1, params=params, ema_params=ema,
                opt_state=opt_state,
            ), metrics

        fn = jax.jit(step, donate_argnums=(0,) if donate else ())
        if not hasattr(self, "_step_cache"):
            self._step_cache = {}
        self._step_cache[key] = fn
        return fn

    def reconstruct(self, params, x, rng, mode: str = "pixel"):
        """Pad H,W to x(2*patch) multiples — x28 for patch 14 — reconstruct,
        unpad (reference :405-474; the x2 covers the latent down/upsample).
        Padding is split symmetrically (top/bottom, left/right) exactly as
        lightning_uniflow_model.py:420-442 does, so the model sees the image
        centered in the padded canvas and metrics match the reference."""
        b, h, w, c = x.shape
        mult = 2 * self.model.cfg.patch_size
        ph, pw = (-h) % mult, (-w) % mult
        pt, pl = ph // 2, pw // 2
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (pt, ph - pt), (pl, pw - pl), (0, 0)))
        out = self.model.apply(params, x, rng, mode=mode)
        if mode == "pixel" and (ph or pw):
            out = out[:, pt:pt + h, pl:pl + w]
        return out
