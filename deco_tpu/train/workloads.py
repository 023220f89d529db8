"""Config-driven UniFlow, VAE-GAN, and DCAE-eval workloads — first-class runs.

Completes the single-CLI story (SURVEY caveat 1: one CLI whose config cleanly
selects the workload): ``deco_tpu.cli fit -c configs_flow/uniflow_*.yaml`` and
``-c configs/vae_training*.yaml`` route here based on the config shape.

Two config schemas are accepted per workload:

* the **reference schema** — ``model.config_path`` + flags for UniFlow
  (``src/lightning_uniflow_model.py:52-64`` of hhhhzp/DeCo) and
  ``model.vae_model``/``model.loss_module`` class-path nodes for the VAE-GAN
  (``configs/vae_training.yaml:45-92``), so the reference's configs_flow/ and
  configs/ YAMLs drive identical workloads;
* deco_tpu's flat schema (kept for tiny-test ergonomics).

Both run loops are first-class (reference ``LightningUniFlowModel`` /
``LightningModelVAE`` feature set): mesh-sharded batches, Orbax step-interval
checkpoints with resume and on-exception save, scalar logging, and a
validate/predict path computing PSNR/SSIM/FID with side-by-side image logging
(``lightning_uniflow_model.py:405-474``). The reference's
MultiModelDDPStrategy (``src/strategies/multi_model_ddp.py:41-74``) has no
equivalent here by design: under pjit the generator and discriminator are two
param trees updated in one compiled step — there is no DDP bookkeeping to fix.
"""

from __future__ import annotations

import os
import warnings
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from deco_tpu.parallel import mesh as mesh_lib

# ---------------------------------------------------------------------------
# workload detection
# ---------------------------------------------------------------------------


def detect_workload(config: Dict[str, Any]) -> str:
    m = config.get("model", {}) or {}
    if "config_path" in m or "vit_hidden_size" in m:
        return "uniflow"
    if ("vae_model" in m and "loss_module" in m) or (
        "discriminator" in config and "loss" in config
    ):
        return "vae_gan"
    if "vae_weight_path" in m or "decoder_checkpoint_path" in m:
        return "dcae_eval"
    return "diffusion"


def is_uniflow_config(config: Dict[str, Any]) -> bool:
    return detect_workload(config) == "uniflow"


def is_vae_config(config: Dict[str, Any]) -> bool:
    return detect_workload(config) == "vae_gan"


# ---------------------------------------------------------------------------
# shared config parsing
# ---------------------------------------------------------------------------


class _TrainerSection:
    """The reference Lightning ``trainer:`` block distilled to what the JAX
    run loops consume (max_steps, clip, logging cadence, callback args)."""

    def __init__(self, config: Dict[str, Any]):
        t = config.get("trainer", {}) or {}
        self.max_steps = t.get("max_steps")
        self.grad_clip = t.get("gradient_clip_val", 1.0)
        self.log_every = t.get("log_every_n_steps", 10)
        self.default_root_dir = t.get("default_root_dir", "./workdirs")
        cbs = {}
        for cb in t.get("callbacks", []) or []:
            name = cb.get("class_path", "").rsplit(".", 1)[-1]
            cbs[name] = cb.get("init_args", {}) or {}
        self.ckpt_every = cbs.get("CheckpointHook", {}).get(
            "every_n_train_steps", 10000)
        self.metrics_cfg = cbs.get("ComputeMetricsHook")
        self.save_images_cfg = cbs.get("SaveImagesHook")
        # reference WandbLogger node (configs/vae_training.yaml:15-18);
        # project falls back to the run name — activation is import-gated
        # in hooks._maybe_wandb (wandb absent => JSONL+TB only)
        lg = t.get("logger") or {}
        self.wandb_project = None
        if "WandbLogger" in str(lg.get("class_path", "")):
            args = lg.get("init_args", {}) or {}
            self.wandb_project = args.get("project", args.get("name", "deco"))


def _make_mesh(config):
    """Mesh from config: ``mesh: {data: N, model: M}`` sets the axes (tests
    use data=1 to skip SPMD partitioning; model>1 enables fsdp-style param
    sharding; default = all devices on the data axis)."""
    mcfg = config.get("mesh") or {}
    n = mcfg.get("data")
    model = int(mcfg.get("model", 1))
    if n:
        return mesh_lib.make_mesh(
            model=model, devices=jax.devices()[:int(n) * model])
    return mesh_lib.make_mesh(model=model)


def _workdir(config, trainer: _TrainerSection, workdir: Optional[str],
             default: str) -> str:
    if workdir:
        return workdir
    exp = (config.get("tags") or {}).get("exp")
    if exp:
        return os.path.join(trainer.default_root_dir, str(exp))
    return default


def _opt_args(node, default_lr: float):
    """torch.optim.AdamW class-path node -> (lr, weight_decay, betas)."""
    args = (node or {}).get("init_args", {}) or {}
    return (args.get("lr", default_lr), args.get("weight_decay", 0.0),
            tuple(args.get("betas", (0.9, 0.95))))


def _make_dataset(data_cfg: Dict[str, Any], key: str, resolution: int):
    """Reference schema: ``data.<key>`` class-path node via the registry;
    flat schema: ``train_root`` ImageFolder."""
    from deco_tpu.config import registry

    node = data_cfg.get(key)
    if isinstance(node, dict) and "class_path" in node:
        return registry.instantiate(node)
    if key == "train_dataset" and "train_root" in data_cfg:
        from deco_tpu.data.imagenet import PixImageNet

        return PixImageNet(data_cfg["train_root"], resolution=resolution)
    return None


def _uint8(x) -> np.ndarray:
    from deco_tpu.models.autoencoders import fp_to_uint8

    return np.asarray(jax.device_get(fp_to_uint8(jnp.asarray(x))))


# ---------------------------------------------------------------------------
# UniFlow
# ---------------------------------------------------------------------------


def _resolve_uniflow_config_path(path: Optional[str]) -> str:
    """Map the reference's ``src/models/uniflow/config.json`` (and any
    missing path) to the vendored HF config shipped with deco_tpu."""
    import deco_tpu.models.uniflow as pkg

    vendored = os.path.join(os.path.dirname(pkg.__file__), "config.json")
    if not path:
        return vendored
    if os.path.exists(path):
        return path
    cand = os.path.join(path, "config.json")
    if os.path.exists(cand):
        return cand
    return vendored


def _build_uniflow_teacher(path: Optional[str]):
    """Frozen InternVL teacher for distillation (reference
    LightweightTeacherModel, lightning_uniflow_model.py:523-564).

    Weights-gated: returns a jitted feature fn when a converted InternVL
    checkpoint directory is available, else None with a warning (zero-egress
    environments train with the self-distillation target instead — the
    forward_loss teacher_feat=None branch)."""
    if not path or not os.path.isdir(path):
        if path:
            warnings.warn(
                f"distill=true but teacher weights not found at {path}; "
                "falling back to self-distillation targets (weights-gated)."
            )
        return None
    try:
        from deco_tpu.convert.vit_bridge import load_teacher_feature_fn

        return load_teacher_feature_fn(path)
    except Exception as e:  # pragma: no cover - weights-gated
        warnings.warn(f"teacher load failed ({e}); self-distillation fallback")
        return None


class UniFlowRun:
    """First-class UniFlow workload (reference LightningUniFlowModel)."""

    def __init__(self, config: Dict[str, Any], workdir: Optional[str] = None):
        import dataclasses

        from deco_tpu.models.uniflow import UniFlowConfig
        from deco_tpu.train.uniflow_loop import (UniFlowExperiment,
                                                 UniFlowTrainConfig)

        self.config = config
        m = config["model"]
        self.trainer = _TrainerSection(config)

        if "config_path" in m:  # reference LightningUniFlowModel surface
            model_cfg = UniFlowConfig.from_pretrained(
                _resolve_uniflow_config_path(m.get("config_path")))
            if m.get("train_semantic_ae", False):
                # semantic-AE training drops the pixel branch
                model_cfg = dataclasses.replace(
                    model_cfg, enable_pixel_branch=False)
            lr, wd, betas = _opt_args(m.get("optimizer"), 2e-4)
            use_ema = m.get("use_ema", True)
            ema_decay = ((m.get("ema_tracker") or {}).get("init_args", {})
                         or {}).get("decay", 0.9999)
            train_cfg = UniFlowTrainConfig(
                lr=lr, weight_decay=wd, betas=betas,
                total_steps=self.trainer.max_steps or 200000,
                use_ema=use_ema, ema_decay=ema_decay,
                # reference class defaults (lightning_uniflow_model.py:62-63)
                frozen_encoder=m.get("frozen_encoder", True),
                frozen_mlp=m.get("frozen_mlp", True),
                grad_clip=self.trainer.grad_clip,
            )
            self.distill = m.get("distill", False)
            # distill teacher (InternVL3-2B) and warm-start ckpt are distinct
            # upstream (configure_model vs pretrain_model_path)
            self.teacher_path = m.get("teacher_model_path")
            self.pretrain_path = m.get("pretrain_model_path")
            self.eval_original_model = m.get("eval_original_model", False)
        else:  # flat schema
            model_cfg = UniFlowConfig(**{
                k: v for k, v in m.items()
                if k in {f.name for f in dataclasses.fields(UniFlowConfig)}
            })
            tkw = {k: v for k, v in (config.get("train") or {}).items()
                   if k in UniFlowTrainConfig.__dataclass_fields__}
            train_cfg = UniFlowTrainConfig(**tkw)
            self.distill = False
            self.teacher_path = None
            self.pretrain_path = None
            self.eval_original_model = True

        teacher = (_build_uniflow_teacher(self.teacher_path)
                   if self.distill else None)
        self.exp = UniFlowExperiment(model_cfg, train_cfg, teacher_fn=teacher)
        self.model_cfg = model_cfg
        self.train_cfg = train_cfg
        self.mesh = _make_mesh(config)
        self.workdir = _workdir(config, self.trainer, workdir,
                                "./workdirs_uniflow")
        os.makedirs(self.workdir, exist_ok=True)

    # -- data --

    def _loader(self, key: str, batch_per_device: int, infinite: bool):
        from deco_tpu.data.loader import make_loader

        data_cfg = self.config.get("data", {}) or {}
        res = data_cfg.get("resolution", self.model_cfg.image_size)
        dataset = _make_dataset(data_cfg, key, res)
        if dataset is None:
            raise ValueError(f"config has no data.{key}")
        size_key = ("train_batch_size" if key == "train_dataset"
                    else "pred_batch_size")
        per_dev = data_cfg.get(size_key,
                               data_cfg.get("batch_size", batch_per_device))
        batch = per_dev * self.mesh.shape[mesh_lib.DATA_AXIS]
        return make_loader(dataset, batch, infinite=infinite,
                           shuffle=infinite,
                           num_workers=data_cfg.get("train_num_workers", 2)), batch

    def _place(self, state):
        """Mesh-place the FULL state (params, ema, opt_state) so the donated
        step's output shardings match its inputs — an unplaced opt_state
        forces a silent recompile on the second step (measured 140s on the
        CPU mesh)."""
        ms = int((self.config.get("mesh") or {}).get(
            "param_shard_min_size", 2**20))
        sp = lambda t: mesh_lib.shard_params(self.mesh, t, min_size=ms)
        return state.replace(
            params=sp(state.params),
            ema_params=(sp(state.ema_params)
                        if state.ema_params is not None else None),
            opt_state=sp(state.opt_state),
        )

    def _init_state(self, batch: int):
        res = (self.config.get("data", {}) or {}).get(
            "resolution", self.model_cfg.image_size)
        rng = jax.random.PRNGKey(self.config.get("seed", 0))
        return self._place(
            self.exp.init_state(rng, jnp.zeros((batch, res, res, 3))))

    # -- fit --

    def fit(self, max_steps: Optional[int] = None,
            ckpt_path: Optional[str] = None):
        from deco_tpu.train.checkpoint import CheckpointManager
        from deco_tpu.train.hooks import ScalarLogger

        loader, batch = self._loader("train_dataset", 8, infinite=True)
        state = self._init_state(batch)
        ckpt = CheckpointManager(os.path.join(self.workdir, "checkpoints"),
                                 every_n_steps=self.trainer.ckpt_every)
        if ckpt_path:
            state = self._place(CheckpointManager(ckpt_path, 0).restore(state))
        elif ckpt.latest_step() is not None:
            state = self._place(ckpt.restore(state))
        elif self.pretrain_path and os.path.isdir(str(self.pretrain_path)):
            # partial warm start (pretrain_model_path, strict=False semantics)
            try:
                state = CheckpointManager(self.pretrain_path, 0).restore(state)
                state = state.replace(step=jnp.zeros((), jnp.int32))
            except Exception as e:
                warnings.warn(f"pretrain warm-start failed ({e}); fresh init")

        step_fn = self.exp.make_train_step()
        logger = ScalarLogger(self.workdir,
                              log_every_n_steps=self.trainer.log_every,
                              wandb_project=self.trainer.wandb_project,
                              run_config=self.config)
        rng = jax.random.PRNGKey(self.config.get("seed", 0))
        limit = max_steps if max_steps is not None else (
            self.trainer.max_steps or self.train_cfg.total_steps)
        from deco_tpu.utils.preemption import PreemptionGuard

        try:
            with jax.set_mesh(self.mesh), PreemptionGuard() as preempt:
                for bi, (bx, _, _) in enumerate(loader):
                    step = int(state.step)
                    if step >= limit or preempt.requested:
                        break
                    batch_d = {"x": jnp.asarray(bx, jnp.float32)}
                    if self.exp.teacher_fn is not None:
                        batch_d["teacher_feat"] = self.exp.teacher_fn(
                            batch_d["x"])
                    batch_d = mesh_lib.shard_batch(self.mesh, batch_d)
                    state, metrics = step_fn(state, batch_d,
                                             jax.random.fold_in(rng, step))
                    logger.log(step, metrics)
                    ckpt.maybe_save(state)
        except BaseException:
            # on-exception checkpoint: crash/preemption recovery (the hook the
            # reference left commented out, model_checkpoint.py:21-23)
            ckpt.maybe_save(state, force=True)
            raise
        ckpt.maybe_save(state, force=True)
        logger.close()
        return state

    # -- validate / predict --

    def validate(self, state=None, ckpt_path: Optional[str] = None,
                 max_batches: Optional[int] = None, mode: str = "pixel"):
        """Reconstruction eval: pad-to-28 reconstruct, PSNR/SSIM/FID, and
        side-by-side image logging (reference predict_step,
        lightning_uniflow_model.py:405-474)."""
        import json

        from deco_tpu.train.checkpoint import CheckpointManager
        from deco_tpu.train.hooks import ComputeMetricsHook, ImageLogger

        loader, batch = self._loader("eval_dataset", 8, infinite=False)
        if state is None:
            state = self._init_state(batch)
            path = ckpt_path or os.path.join(self.workdir, "checkpoints")
            try:
                state = CheckpointManager(path, 0).restore(state)
            except FileNotFoundError:
                warnings.warn("validate with randomly initialized params "
                              f"(no checkpoint under {path})")
        params = state.params if (self.eval_original_model
                                  or state.ema_params is None) \
            else state.ema_params
        metrics_hook = ComputeMetricsHook(**(self.trainer.metrics_cfg or {}))
        imlog = ImageLogger(self.workdir)
        recon_fn = jax.jit(
            lambda p, x, r: self.exp.reconstruct(p, x, r, mode=mode))
        rng = jax.random.PRNGKey(1234)
        with jax.set_mesh(self.mesh):
            for bi, (bx, _, _) in enumerate(loader):
                if max_batches is not None and bi >= max_batches:
                    break
                x = mesh_lib.shard_batch(
                    self.mesh, jnp.asarray(bx, jnp.float32))
                recon = recon_fn(params, x, jax.random.fold_in(rng, bi))
                ru8, ou8 = _uint8(recon), _uint8(x)
                metrics_hook.on_batch_end(ru8, ou8)
                imlog.log_side_by_side(int(state.step), ou8, ru8)
        scores = metrics_hook.on_epoch_end()
        if jax.process_index() == 0 and scores:
            with open(os.path.join(self.workdir, "validate_metrics.json"),
                      "w") as f:
                json.dump({k: float(v) for k, v in scores.items()}, f)
        return scores


def run_uniflow(config: Dict[str, Any], max_steps: Optional[int] = None,
                workdir: str = "./workdirs_uniflow",
                ckpt_path: Optional[str] = None, subcommand: str = "fit",
                max_batches: Optional[int] = None):
    run = UniFlowRun(config, workdir=workdir)
    if subcommand == "fit":
        return run.fit(max_steps=max_steps, ckpt_path=ckpt_path)
    return run.validate(ckpt_path=ckpt_path, max_batches=max_batches)


# ---------------------------------------------------------------------------
# VAE-GAN
# ---------------------------------------------------------------------------


class VAEGANRun:
    """First-class VAE-GAN workload (reference LightningModelVAE)."""

    def __init__(self, config: Dict[str, Any], workdir: Optional[str] = None):
        from deco_tpu.models.gan.discriminator import NLayerDiscriminator
        from deco_tpu.models.gan.vae_loss import VAEGANLoss
        from deco_tpu.models.uniflow.vit import ViTConfig
        from deco_tpu.models.vae_models import VAEModel

        self.config = config
        self.trainer = _TrainerSection(config)
        m = config["model"]

        if "vae_model" in m:  # reference configs/vae_training*.yaml surface
            from deco_tpu.config import registry

            self.vae = registry.instantiate(m["vae_model"])
            loss_node = registry.instantiate(m["loss_module"])
            self.loss_cfg = loss_node.loss_cfg
            self.perceptual_spec = loss_node.perceptual_spec
            self.disc = NLayerDiscriminator()
            self.freeze_encoder = m.get("freeze_encoder", False)
            gl, gwd, gb = _opt_args(m.get("optimizer"), 1e-4)
            dl, dwd, db = _opt_args(m.get("discriminator_optimizer"), 1e-4)
            self.use_ema = "ema_tracker" in m
            self.ema_decay = ((m.get("ema_tracker") or {}).get(
                "init_args", {}) or {}).get("decay", 0.9999)
            self.eval_original_model = m.get("eval_original_model", True)
        else:  # flat schema
            vit = ViTConfig(**{
                k: v for k, v in (m.get("vit") or {}).items()
                if k in ViTConfig.__dataclass_fields__
            })
            vae_kw = dict(
                vit=vit, llm_hidden_size=m.get("llm_hidden_size", 1536),
                latent_channel=m.get("latent_channel", 32),
                gen_select_layer=m.get("gen_select_layer", 18),
                stochastic=m.get("stochastic", False),
            )
            for k in ("decoder_channels", "decoder_layers", "decoder_attn"):
                if k in m:
                    vae_kw[k] = tuple(m[k])
            self.vae = VAEModel(**vae_kw)
            self.disc = NLayerDiscriminator(**config.get("discriminator", {}))
            loss_keys = ("reconstruction_loss", "reconstruction_weight",
                         "perceptual_weight", "discriminator_weight",
                         "discriminator_factor", "discriminator_iter_start",
                         "lecam_regularization_weight", "distillation_weight",
                         "distillation_loss_type", "kl_weight")
            self.loss_cfg = VAEGANLoss(**{
                k: v for k, v in config.get("loss", {}).items()
                if k in loss_keys
            })
            self.perceptual_spec = config.get("loss", {}).get(
                "perceptual_model")
            opt_cfg = config.get("optimizer", {})
            gl, gwd, gb = opt_cfg.get("gen_lr", 1e-4), 0.0, (0.9, 0.95)
            dl, dwd, db = opt_cfg.get("disc_lr", 1e-4), 0.0, (0.9, 0.95)
            self.trainer.grad_clip = opt_cfg.get(
                "grad_clip", self.trainer.grad_clip)
            self.freeze_encoder = m.get("freeze_encoder", False)
            self.use_ema = False
            self.ema_decay = 0.9999
            self.eval_original_model = True

        self.gen_opt = (gl, gwd, gb)
        self.disc_opt = (dl, dwd, db)
        self._perceptual = None  # built lazily (frozen-tower init is costly)
        self.mesh = _make_mesh(config)
        self.workdir = _workdir(config, self.trainer, workdir,
                                "./workdirs_vae")
        os.makedirs(self.workdir, exist_ok=True)

    def _loader(self, key: str, infinite: bool):
        from deco_tpu.data.loader import make_loader

        data_cfg = self.config.get("data", {}) or {}
        res = data_cfg.get(
            "resolution",
            self.vae.vit.image_size if hasattr(self.vae, "vit") else 224)
        dataset = _make_dataset(data_cfg, key, res)
        if dataset is None:
            raise ValueError(f"config has no data.{key}")
        size_key = ("train_batch_size" if key == "train_dataset"
                    else "pred_batch_size")
        per_dev = data_cfg.get(size_key, data_cfg.get("batch_size", 4))
        batch = per_dev * self.mesh.shape[mesh_lib.DATA_AXIS]
        return make_loader(dataset, batch, infinite=infinite,
                           shuffle=infinite), batch, res

    def _init_state(self, batch: int, res: int):
        """Build the two-optimizer state (cosine per-step schedules like the
        reference optimizers, lightning_model_ae.py:188-292)."""
        from deco_tpu.train.schedules import cosine_with_min_lr
        from deco_tpu.train.vae_gan_step import VAEGANTrainState

        total = self.trainer.max_steps or 200000
        rng = jax.random.PRNGKey(self.config.get("seed", 0))
        x0 = jnp.zeros((batch, res, res, 3))
        gen_params = self.vae.init(rng, x0)["params"]
        disc_params = self.disc.init(jax.random.fold_in(rng, 1), x0)["params"]
        make = lambda spec: optax.adamw(
            cosine_with_min_lr(spec[0], 0, total, 0.0),
            b1=spec[2][0], b2=spec[2][1], weight_decay=spec[1])
        gen_tx = make(self.gen_opt)
        if self.freeze_encoder:
            from deco_tpu.train.freeze import with_frozen

            gen_tx = with_frozen(gen_tx, gen_params, ["vision_model"])
        state = VAEGANTrainState.create(
            gen_params, disc_params, gen_tx, make(self.disc_opt),
            ema=self.use_ema)
        return self._place(state)

    def _place(self, state):
        """Mesh-place ALL state leaves (see UniFlowRun._place: an unplaced
        optimizer state silently recompiles the donated step)."""
        ms = int((self.config.get("mesh") or {}).get(
            "param_shard_min_size", 2**20))
        sp = lambda t: mesh_lib.shard_params(self.mesh, t, min_size=ms)
        return state.replace(
            gen_params=sp(state.gen_params),
            disc_params=sp(state.disc_params),
            gen_opt_state=sp(state.gen_opt_state),
            disc_opt_state=sp(state.disc_opt_state),
            gen_ema_params=(sp(state.gen_ema_params)
                            if state.gen_ema_params is not None else None),
            lecam=sp(state.lecam),
        )

    def _ckpt_payload(self, state):
        return dict(
            step=int(state.step),
            gen_params=state.gen_params,
            disc_params=state.disc_params,
            gen_opt_state=state.gen_opt_state,
            disc_opt_state=state.disc_opt_state,
            gen_ema_params=state.gen_ema_params,
            lecam=dict(ema_real=state.lecam.ema_real,
                       ema_fake=state.lecam.ema_fake),
        )

    def _restore(self, ckpt, state, step=None):
        from deco_tpu.models.gan.vae_loss import LeCamState

        restored = ckpt.restore_payload(self._ckpt_payload(state), step)
        return self._place(state.replace(
            step=jnp.asarray(restored["step"], jnp.int32),
            gen_params=restored["gen_params"],
            disc_params=restored["disc_params"],
            gen_opt_state=restored["gen_opt_state"],
            disc_opt_state=restored["disc_opt_state"],
            gen_ema_params=restored["gen_ema_params"],
            lecam=LeCamState(ema_real=restored["lecam"]["ema_real"],
                             ema_fake=restored["lecam"]["ema_fake"]),
        ))

    @property
    def perceptual(self):
        if self._perceptual is None and self.perceptual_spec:
            from deco_tpu.models.perceptual import PerceptualLoss

            self._perceptual = PerceptualLoss(self.perceptual_spec)
        return self._perceptual

    def _make_step(self):
        if getattr(self, "_step_fn", None) is not None:
            return self._step_fn
        from deco_tpu.train.vae_gan_step import make_vae_gan_step

        self._step_fn = make_vae_gan_step(
            vae_apply=lambda p, x, r: self.vae.apply({"params": p}, x, r),
            disc_apply=lambda p, img: self.disc.apply({"params": p}, img),
            loss_cfg=self.loss_cfg,
            last_layer_path=("decoder", "conv_out"),
            perceptual_fn=self.perceptual,
            grad_clip=self.trainer.grad_clip,
            ema_decay=self.ema_decay,
        )
        return self._step_fn

    def fit(self, max_steps: Optional[int] = None,
            ckpt_path: Optional[str] = None):
        from deco_tpu.train.checkpoint import CheckpointManager
        from deco_tpu.train.hooks import ScalarLogger

        loader, batch, res = self._loader("train_dataset", infinite=True)
        state = self._init_state(batch, res)
        ckpt = CheckpointManager(os.path.join(self.workdir, "checkpoints"),
                                 every_n_steps=self.trainer.ckpt_every)
        if ckpt_path:
            state = self._restore(CheckpointManager(ckpt_path, 0), state)
        elif ckpt.latest_step() is not None:
            state = self._restore(ckpt, state)

        step_fn = self._make_step()
        logger = ScalarLogger(self.workdir,
                              log_every_n_steps=self.trainer.log_every,
                              wandb_project=self.trainer.wandb_project,
                              run_config=self.config)
        rng = jax.random.PRNGKey(self.config.get("seed", 0))
        limit = max_steps if max_steps is not None else (
            self.trainer.max_steps or 200000)
        save = lambda force=False: ckpt.maybe_save_payload(
            int(state.step), self._ckpt_payload(state), force=force)
        from deco_tpu.utils.preemption import PreemptionGuard

        try:
            with jax.set_mesh(self.mesh), PreemptionGuard() as preempt:
                for bi, (bx, _, _) in enumerate(loader):
                    step = int(state.step)
                    if step >= limit or preempt.requested:
                        break
                    batch_d = mesh_lib.shard_batch(
                        self.mesh, {"x": jnp.asarray(bx, jnp.float32)})
                    state, metrics = step_fn(state, batch_d,
                                             jax.random.fold_in(rng, step))
                    logger.log(step, metrics)
                    save()
        except BaseException:
            save(force=True)
            raise
        save(force=True)
        logger.close()
        return state

    def validate(self, state=None, ckpt_path: Optional[str] = None,
                 max_batches: Optional[int] = None):
        """Reconstruction eval with PSNR/SSIM/FID + side-by-side images +
        optional ADM-layout npz (reference SaveImagesHook on the VAE run,
        configs/vae_training.yaml:35-42)."""
        import json

        from deco_tpu.train.checkpoint import CheckpointManager
        from deco_tpu.train.hooks import (ComputeMetricsHook, ImageLogger,
                                          SaveImagesHook)

        loader, batch, res = self._loader("eval_dataset", infinite=False)
        if state is None:
            state = self._init_state(batch, res)
            path = ckpt_path or os.path.join(self.workdir, "checkpoints")
            try:
                state = self._restore(CheckpointManager(path, 0), state)
            except FileNotFoundError:
                warnings.warn("validate with randomly initialized params "
                              f"(no checkpoint under {path})")
        params = state.gen_params if (self.eval_original_model
                                      or state.gen_ema_params is None) \
            else state.gen_ema_params
        recon_fn = jax.jit(
            lambda p, x: self.vae.apply({"params": p}, x)[0])
        metrics_hook = ComputeMetricsHook(**(self.trainer.metrics_cfg or {}))
        imlog = ImageLogger(self.workdir)
        save_hook = None
        if self.trainer.save_images_cfg is not None:
            save_hook = SaveImagesHook(**self.trainer.save_images_cfg)
            save_hook.on_predict_start(self.workdir, int(state.step))
        with jax.set_mesh(self.mesh):
            for bi, (bx, _, bmeta) in enumerate(loader):
                if max_batches is not None and bi >= max_batches:
                    break
                x = mesh_lib.shard_batch(
                    self.mesh, jnp.asarray(bx, jnp.float32))
                # reference protocol (encoder_ae.py:462-483): center-pad the
                # input to a 2*patch canvas (28 for the shipped patch-14 ViT)
                # with value -1, reconstruct, then center-crop the
                # reconstruction back to the input HW so PSNR/SSIM/FID always
                # compare at the original size
                mult = 2 * getattr(getattr(self.vae, "vit", None),
                                   "patch_size", 14)
                h, w = x.shape[1], x.shape[2]
                ph, pw = (-h) % mult, (-w) % mult
                xp = x
                if ph or pw:
                    pt, pl = ph // 2, pw // 2
                    xp = jnp.pad(x, ((0, 0), (pt, ph - pt), (pl, pw - pl),
                                     (0, 0)), constant_values=-1.0)
                recon = recon_fn(params, xp)
                ct = (recon.shape[1] - h) // 2
                cl = (recon.shape[2] - w) // 2
                recon = recon[:, ct:ct + h, cl:cl + w]
                ru8, ou8 = _uint8(recon), _uint8(x)
                metrics_hook.on_batch_end(ru8, ou8)
                imlog.log_side_by_side(int(state.step), ou8, ru8)
                if save_hook is not None:
                    save_hook.on_predict_batch_end(ru8, bmeta)
        scores = metrics_hook.on_epoch_end()
        if save_hook is not None:
            save_hook.on_predict_end()
        if jax.process_index() == 0 and scores:
            with open(os.path.join(self.workdir, "validate_metrics.json"),
                      "w") as f:
                json.dump({k: float(v) for k, v in scores.items()}, f)
        return scores


def run_vae_gan(config: Dict[str, Any], max_steps: Optional[int] = None,
                workdir: str = "./workdirs_vae",
                ckpt_path: Optional[str] = None, subcommand: str = "fit",
                max_batches: Optional[int] = None):
    run = VAEGANRun(config, workdir=workdir)
    if subcommand == "fit":
        return run.fit(max_steps=max_steps, ckpt_path=ckpt_path)
    return run.validate(ckpt_path=ckpt_path, max_batches=max_batches)


# ---------------------------------------------------------------------------
# DCAE decoder eval
# ---------------------------------------------------------------------------


def run_dcae_eval(config: Dict[str, Any], workdir: str = "./workdirs_dcae",
                  max_batches: Optional[int] = None, **_):
    """Route configs_flow/dcae_decoder_eval.yaml to the DCAE decoder eval
    (reference eval_dcae.py + LightningDCAEEvalModel)."""
    from deco_tpu.eval_dcae import evaluate

    m = config.get("model", {}) or {}
    data = config.get("data", {}) or {}
    root = (data.get("eval_dataset", {}) or {}).get(
        "init_args", {}).get("root", data.get("eval_root", "."))
    return evaluate(
        image_root=root,
        resolution=data.get("resolution", 224),
        batch_size=data.get("pred_batch_size", 4),
        llm_hidden_size=m.get("llm_hidden_size", 3200),
        max_batches=max_batches if max_batches is not None else 8,
        ckpt_path=m.get("decoder_checkpoint_path"),
    )
