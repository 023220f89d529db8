"""Experiment orchestration: config -> model/trainer/sampler/data -> fit/predict.

TPU-native equivalent of the reference's LightningCLI + LightningModel
orchestration (``main.py:41-122``, ``src/lightning_model.py:30-368`` of
hhhhzp/DeCo). One generic diffusion experiment parameterized by config — the
rebuild fixes the reference snapshot's swapped-entry-point hack (SURVEY
caveat 1): the YAML ``model:`` section cleanly selects the workload.

Responsibilities mapped from the reference:
- workdir from ``tags.exp``; refuse non-empty workdir unless resuming
  (main.py:83-89); resolved-config snapshot per run (main.py:24-38)
- fit: sharded loader -> jitted train step (loss+grad+AdamW+EMA fused) ->
  scalar logging -> step-interval Orbax checkpoints
- predict: seeded-noise dataset -> jitted sampler scan on the EMA params ->
  vae.decode -> uint8 -> SaveImagesHook (per-sample save_fn + ADM npz)
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from deco_tpu.config import registry
from deco_tpu.models.autoencoders import fp_to_uint8
from deco_tpu.parallel import mesh as mesh_lib
from deco_tpu.train.checkpoint import CheckpointManager
from deco_tpu.train.hooks import SaveImagesHook, ScalarLogger
from deco_tpu.train.state import TrainState
from deco_tpu.train.train_step import make_train_step


def _nhwc_latent_shape(latent_shape):
    """Configs carry CHW (reference convention); runtime is NHWC."""
    c, h, w = latent_shape
    return h, w, c


class Experiment:
    # how many train steps the host may dispatch ahead of the chip (fit()):
    # >=1 overlaps batch prep/H2D with device compute; small so queued input
    # buffers stay bounded at near-OOM batch sizes
    _TRAIN_RUNAHEAD = 2

    def __init__(self, config: Dict[str, Any], workdir: Optional[str] = None,
                 resume: bool = False):
        self.config = config
        model_cfg = config["model"]
        self.vae = registry.instantiate(model_cfg["vae"])
        self.denoiser_cfg = model_cfg["denoiser"]
        self.model = registry.instantiate(self.denoiser_cfg)
        # ReCo reconstruction configs carry no conditioner node: the condition
        # is the input image itself (configs_c2i/ReCo_large*.yaml,
        # configs_flow/internvit_2b_*.yaml)
        if "conditioner" in model_cfg:
            self.conditioner = registry.instantiate(model_cfg["conditioner"])
        else:
            from deco_tpu.models.conditioners import ImageConditioner

            self.conditioner = ImageConditioner()
        self._cond_on_images = getattr(self.conditioner, "wants_images", False)
        self.trainer = registry.instantiate(model_cfg["diffusion_trainer"])
        self.sampler = registry.instantiate(model_cfg["diffusion_sampler"])
        # REPA needs the model's feature tap wired to the trainer's align
        # layer (JiT carries the same active REPA branch upstream)
        from deco_tpu.diffusion.training import JiTTrainer, REPATrainer

        if isinstance(self.trainer, (JiTTrainer, REPATrainer)) and hasattr(
            self.model, "align_layer"
        ):
            import dataclasses

            self.model = dataclasses.replace(
                self.model, align_layer=self.trainer.align_layer
            )
        self.ema_cfg = registry.instantiate(
            model_cfg.get("ema_tracker", {"class_path":
                "src.callbacks.simple_ema.SimpleEMA"})
        )
        self.opt_cfg = registry.instantiate(
            model_cfg.get("optimizer", {"class_path": "torch.optim.AdamW"})
        )
        trainer_cfg = config.get("trainer", {})
        self.max_steps = trainer_cfg.get("max_steps", 100)
        self.ckpt_every = 10000
        self.log_every = trainer_cfg.get("log_every_n_steps", 50)
        self.grad_clip = trainer_cfg.get("gradient_clip_val")
        self.accumulate_grad_batches = trainer_cfg.get(
            "accumulate_grad_batches", 1)
        for cb in trainer_cfg.get("callbacks", []):
            cp = cb.get("class_path", "")
            if cp.endswith("CheckpointHook"):
                self.ckpt_every = cb.get("init_args", {}).get(
                    "every_n_train_steps", self.ckpt_every
                )
            if cp.endswith("SaveImagesHook"):
                args = cb.get("init_args", {})
                self.save_images_cfg = args
            if cp.endswith("ComputeMetricsHook"):
                self.metrics_hook_cfg = cb.get("init_args", {})
        if not hasattr(self, "save_images_cfg"):
            self.save_images_cfg = {"save_dir": "val"}
        # reference WandbLogger node; import-gated in hooks._maybe_wandb
        lg = trainer_cfg.get("logger") or {}
        self.wandb_project = None
        if "WandbLogger" in str(lg.get("class_path", "")):
            args = lg.get("init_args", {}) or {}
            self.wandb_project = args.get("project", args.get("name", "deco"))
        # reference LightningModel default is 4 (lightning_model.py:43); the
        # shipped single-chip configs pin 1 explicitly (16G HBM at the
        # measured batch optima cannot carry the 4x latent replication)
        self.diffusion_batch_mul = model_cfg.get("diffusion_batch_mul", 4)

        exp_name = config.get("tags", {}).get("exp", "exp")
        root = trainer_cfg.get("default_root_dir", "./workdirs")
        self.workdir = workdir or os.path.join(root, exp_name)
        if os.path.isdir(self.workdir) and os.listdir(self.workdir) and not resume:
            raise FileExistsError(
                f"workdir {self.workdir} is not empty; pass resume=True or "
                "--ckpt_path to continue (main.py:83-89 semantics)"
            )
        os.makedirs(self.workdir, exist_ok=True)
        self._save_config_snapshot()
        self.mesh = mesh_lib.make_mesh(model=config.get("mesh_model_axis", 1))

    def _save_config_snapshot(self):
        import yaml

        with open(os.path.join(self.workdir, "config.yaml"), "w") as f:
            yaml.safe_dump(self.config, f, sort_keys=False)

    # ---- setup ----

    def _example_batch(self, dataset, batch_size):
        if hasattr(dataset, "__getitem__"):
            x, y, _ = dataset[0]
        else:  # streaming dataset (PixWebDataset): peek the first sample
            x, y, _ = next(iter(dataset))
        x = jnp.zeros((batch_size,) + np.asarray(x).shape, jnp.float32)
        if self._cond_on_images:
            cond, uncond = self.conditioner(x)
        else:
            cond, uncond = self.conditioner([y] * batch_size)
        return x, cond, uncond

    def _condition(self, bx, by, bmeta):
        if self._cond_on_images:
            return self.conditioner(np.asarray(bx), bmeta)
        return self.conditioner(by, bmeta)

    def init_state(self, sample_x, sample_cond, *, training: bool = True
                   ) -> TrainState:
        t = jnp.zeros((sample_x.shape[0],), jnp.float32)
        rng = jax.random.PRNGKey(self.config.get("seed", 0))
        variables = jax.jit(self.model.init)(rng, sample_x, t, sample_cond)
        extras = sorted(k for k in variables if k != "params")
        if "quant" in extras and training:
            # quantize='int8' (or a global DECO_QUANT=int8) in a training
            # context silently zeroes the trunk gradient: the forward reads
            # only the cached int8 weights, and round/clip kill the gradient
            # to the cached copy — the trunk stops learning while embedders
            # and decoder keep updating. Refuse instead of training garbage.
            raise ValueError(
                f"model.init produced non-'params' collections {extras}: "
                "the int8 trunk (quantize='int8' / DECO_QUANT=int8) is an "
                "inference-only serving mode — under jax.grad the trunk "
                "weights receive exactly zero gradient. Unset it for fit."
            )
        # non-params collections (the int8 'quant' cache) never enter the
        # TrainState: optimizer/EMA state must not allocate over a derived
        # cache, and checkpoints stay layout-identical across modes.
        params = {"params": variables["params"]}
        trainer_params = self.trainer.init_params(jax.random.fold_in(rng, 1))
        if trainer_params:
            # combined layout: trainer-owned trainable state (REPA proj) rides
            # in the same optimizer (reference 3-param-group AdamW semantics)
            params = {"model": params, "trainer": trainer_params}
        tx = self.opt_cfg.build()
        state = TrainState.create(params, tx)
        # place the FULL state (incl. opt_state): a state leaf whose sharding
        # differs from the donated step's output forces a silent recompile on
        # the second step (measured 140s for the uniflow graph on CPU)
        return state.replace(
            params=mesh_lib.shard_params(self.mesh, state.params),
            ema_params=mesh_lib.shard_params(self.mesh, state.ema_params),
            opt_state=mesh_lib.shard_params(self.mesh, state.opt_state),
        )

    # ---- fit ----

    def fit(self, ckpt_path: Optional[str] = None, max_steps: Optional[int] = None):
        from deco_tpu.data.loader import make_loader

        data_cfg = self.config["data"]
        dataset = registry.instantiate(data_cfg["train_dataset"])
        # reference batch sizes are per-device (per-GPU); global = x data axis;
        # accumulate_grad_batches folds k loader batches into one jitted step
        batch_size = (data_cfg.get("train_batch_size", 32)
                      * self.mesh.shape[mesh_lib.DATA_AXIS]
                      * self.accumulate_grad_batches)
        loader = make_loader(
            dataset, batch_size,
            num_workers=data_cfg.get("train_num_workers", 4), infinite=True,
        )
        x, cond, uncond = self._example_batch(dataset, batch_size)
        state = self.init_state(x, cond)
        ckpt = CheckpointManager(
            os.path.join(self.workdir, "checkpoints"),
            every_n_steps=self.ckpt_every,
        )
        if ckpt_path:
            state = CheckpointManager(ckpt_path, 0).restore(state)
        elif ckpt.latest_step() is not None:
            state = ckpt.restore(state)
        resumed_step = int(state.step)
        if resumed_step and hasattr(loader, "set_position"):
            # deterministic mid-epoch data resume: one loader batch per train
            # step, and the seeded per-epoch shuffle makes (epoch, offset) a
            # pure function of the step — the resumed run consumes exactly
            # the batches the interrupted run would have (index math only;
            # no samples fetched for the skipped prefix)
            loader.set_position(resumed_step)

        apply_fn = lambda p, xt, t, y, **kw: self.model.apply(p, xt, t, y, **kw)
        step_fn = make_train_step(
            apply_fn, self.trainer,
            ema_decay=self.ema_cfg.decay,
            ema_every=self.ema_cfg.every_n_steps,
            diffusion_batch_mul=self.diffusion_batch_mul,
            grad_clip=self.grad_clip,
            accumulate_grad_batches=self.accumulate_grad_batches,
        )
        logger = ScalarLogger(self.workdir, log_every_n_steps=self.log_every,
                              wandb_project=self.wandb_project,
                              run_config=self.config)
        rng = jax.random.PRNGKey(self.config.get("seed", 0))
        limit = max_steps if max_steps is not None else self.max_steps

        from deco_tpu.utils.preemption import PreemptionGuard

        # The step counter is tracked on the host: reading int(state.step)
        # every iteration would block on the previous dispatch, serializing
        # host batch prep (conditioning, H2D transfer, sharding) with device
        # compute. With JAX async dispatch the host instead runs up to
        # _TRAIN_RUNAHEAD steps ahead of the chip; the deque bounds in-flight
        # input buffers (each queued batch pins its H2D staging in HBM).
        from collections import deque

        inflight: deque = deque()
        try:
            with jax.set_mesh(self.mesh), PreemptionGuard() as preempt:
                step = int(state.step)
                for bi, (bx, by, bmeta) in enumerate(loader):
                    if step >= limit or preempt.requested:
                        break
                    cond, uncond = self._condition(bx, by, bmeta)
                    batch = dict(
                        x=jnp.asarray(bx), condition=cond, uncondition=uncond,
                    )
                    # objectives declare the metadata arrays they consume
                    # (e.g. REPA's raw_image / precomputed repa_features);
                    # only those cross the jit boundary
                    md = {
                        k: jnp.asarray(bmeta[k])
                        for k in getattr(self.trainer, "metadata_keys", ())
                        if isinstance(bmeta, dict) and k in bmeta
                    }
                    if md:
                        batch["metadata"] = md
                    batch = mesh_lib.shard_batch(self.mesh, batch)
                    state, metrics = step_fn(
                        state, batch, jax.random.fold_in(rng, step)
                    )
                    logger.log(step, metrics)
                    ckpt.maybe_save(state, step=step + 1)
                    step += 1
                    inflight.append(metrics)
                    if len(inflight) > self._TRAIN_RUNAHEAD:
                        jax.block_until_ready(inflight.popleft())
        except BaseException:
            # on-exception checkpoint (the hook the reference left commented
            # out, model_checkpoint.py:21-23) — crash/preemption recovery
            ckpt.maybe_save(state, force=True)
            raise
        ckpt.maybe_save(state, force=True)
        logger.close()
        return state

    # ---- predict / validate ----

    def predict(self, state: Optional[TrainState] = None,
                ckpt_path: Optional[str] = None, use_ema: bool = True,
                max_batches: Optional[int] = None, dataset_key: str = "pred_dataset"):
        from deco_tpu.data.loader import make_loader

        data_cfg = self.config["data"]
        dataset = registry.instantiate(data_cfg[dataset_key])
        batch_size = data_cfg.get("pred_batch_size", 32) * self.mesh.shape[
            mesh_lib.DATA_AXIS]
        loader = make_loader(
            dataset, batch_size, shuffle=False, drop_last=True,
            num_workers=data_cfg.get("pred_num_workers", 1),
        )
        x, cond, uncond = self._example_batch(dataset, batch_size)
        if state is None:
            state = self.init_state(x, cond, training=False)
            if ckpt_path:
                state = CheckpointManager(ckpt_path, 0).restore(state)
        params = state.ema_params if use_ema and state.ema_params is not None \
            else state.params
        if isinstance(params, dict) and "model" in params:
            params = params["model"]
        from deco_tpu.ops.quant import model_quant_active, refresh_quant_cache

        if model_quant_active(self.model):
            # int8 serving: build the weight cache from the params ACTUALLY
            # being served (post-restore, post-EMA-selection). A cache from
            # any earlier params (e.g. random init) would silently serve
            # garbage — see models/layers.verify_quant_cache.
            params = refresh_quant_cache(
                self.model, params, x[:1],
                jnp.zeros((1,), jnp.float32),
                jax.tree.map(lambda a: a[:1], cond),
            )

        sampler = self.sampler

        @jax.jit
        def sample(params, noise, cond, uncond, rng):
            net = lambda xt, t, y: self.model.apply(params, xt, t, y)
            return sampler(net, noise, cond, uncond, rng=rng)

        hook = SaveImagesHook(**self.save_images_cfg)
        hook.on_predict_start(self.workdir, int(state.step))
        # predict-time image logging (reference wandb image logging,
        # lightning_uniflow_model.py:460-471): sample panels to PNG + TB
        from deco_tpu.train.hooks import ImageLogger

        imlog = ImageLogger(self.workdir)
        metrics_hook = None
        if getattr(self, "metrics_hook_cfg", None) is not None:
            from deco_tpu.train.hooks import ComputeMetricsHook

            metrics_hook = ComputeMetricsHook(**self.metrics_hook_cfg)
        rng = jax.random.PRNGKey(1234)

        # Software-pipelined predict (utils/pipeline.py): batch k+1's device
        # work is dispatched before batch k's blocking readback, so the chip
        # never idles for host-side PNG/npz/metric work. The reference loop is
        # strictly serial per batch (src/lightning_model.py:261-316 under
        # Lightning). depth=0 degrades to the serial order (A/B baseline).
        from deco_tpu.utils.pipeline import pipelined_map

        def batches():
            for bi, (bx, by, bmeta) in enumerate(loader):
                if max_batches is not None and bi >= max_batches:
                    return
                cond, uncond = self._condition(bx, by, bmeta)
                if self._cond_on_images:
                    # reconstruction predict: the loader yields images (the
                    # condition); the sampler starts from fresh noise
                    noise = jax.random.normal(
                        jax.random.fold_in(rng, 1000 + bi),
                        jnp.asarray(bx).shape, jnp.float32)
                else:
                    noise = jnp.asarray(bx)
                noise = mesh_lib.shard_batch(self.mesh, noise)
                yield bi, bx, bmeta, cond, uncond, noise

        def dispatch(b):
            bi, bx, bmeta, cond, uncond, noise = b
            imgs = sample(params, noise, cond, uncond,
                          jax.random.fold_in(rng, bi))
            imgs = self.vae.decode(imgs)
            u8_dev = fp_to_uint8(imgs)
            orig_dev = (fp_to_uint8(jnp.asarray(bx))
                        if self._cond_on_images else None)
            return u8_dev, orig_dev

        def consume(out, b):
            bi, bx, bmeta = b[0], b[1], b[2]
            u8_dev, orig_dev = out
            u8 = np.asarray(jax.device_get(u8_dev))
            hook.on_predict_batch_end(u8, bmeta)
            if self._cond_on_images:
                # reconstruction: original|generated side-by-side
                orig = np.asarray(jax.device_get(orig_dev))
                imlog.log_side_by_side(int(state.step), orig, u8)
            elif bi == 0:
                imlog.log_images(int(state.step), u8)
            if metrics_hook is not None and "raw_image" in bmeta:
                raw = np.asarray(bmeta["raw_image"], np.float32)
                if raw.ndim == 4 and raw.shape[1] in (1, 3):
                    raw = raw.transpose(0, 2, 3, 1)  # torch-layout datasets
                metrics_hook.on_batch_end(
                    u8, np.clip(raw * 255.0, 0, 255).astype(np.uint8)
                )
            elif metrics_hook is not None and self._cond_on_images:
                # reconstruction eval: the original IS the loader image
                metrics_hook.on_batch_end(
                    u8, np.asarray(jax.device_get(orig_dev)))

        depth = int(self.config["data"].get("pred_pipeline_depth", 1))
        with jax.set_mesh(self.mesh):
            pipelined_map(batches(), dispatch, consume, depth=depth)
        if metrics_hook is not None and metrics_hook.has_updates:
            scores = metrics_hook.on_epoch_end()
            if jax.process_index() == 0:
                with open(os.path.join(self.workdir, "predict_metrics.json"),
                          "w") as f:
                    json.dump({k: float(v) for k, v in scores.items()}, f)
        return hook.on_predict_end()
