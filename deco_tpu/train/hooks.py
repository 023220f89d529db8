"""Observability hooks: image saving, npz export, scalar logging, EMA config.

TPU-native equivalents of the reference's callback layer (SURVEY §2.12):

- :class:`SaveImagesHook` — per-sample ``save_fn`` dispatch on a thread pool +
  rank-0 npz accumulation for the ADM FID suite
  (``src/callbacks/save_images.py:13-116`` of hhhhzp/DeCo). Under JAX the
  cross-rank all_gather becomes either per-host sharded writes or
  ``multihost_utils.process_allgather``.
- :class:`ScalarLogger` — step scalars to JSONL + optional TensorBoard
  (replaces Lightning ``log_dict``/TensorBoardLogger).
- :class:`GradientMonitor` semantics live in the train step (``grad_norm``
  metric, src/callbacks/grad.py:6-21).
"""

from __future__ import annotations

import json
import os
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Optional

import numpy as np


class SaveImagesHook:
    def __init__(self, save_dir: str, save_compressed: bool = False,
                 max_save_images: int = 10, num_threads: int = 8):
        self.save_dir = save_dir
        self.save_compressed = save_compressed
        self.max_save_images = max_save_images
        self.num_threads = num_threads
        self._pool: Optional[ThreadPoolExecutor] = None
        self._accum = []
        self._saved = 0
        self._futures = []

    def on_predict_start(self, workdir: str, step: int = 0):
        self.root = os.path.join(workdir, self.save_dir, f"iter_{step}")
        os.makedirs(self.root, exist_ok=True)
        self._pool = ThreadPoolExecutor(max_workers=self.num_threads)
        self._accum = []
        self._saved = 0
        self._futures = []

    def on_predict_batch_end(self, images_uint8: np.ndarray, metadata: dict):
        """images: (B, H, W, 3) uint8 on host; metadata from the loader collate."""
        batch = images_uint8.shape[0]
        save_fns = metadata.get("save_fn", [None] * batch)

        def _per_sample(v, i):
            # conditioners put device arrays into metadata (valid_length_y);
            # anything array-like with a leading batch dim must be sliced,
            # not passed whole-batch into every sample's record
            if isinstance(v, list):
                return v[i] if len(v) == batch else v
            if isinstance(v, np.ndarray):
                return v[i] if v.ndim >= 1 and len(v) == batch else v
            if hasattr(v, "__array__") and not isinstance(v, (str, bytes)):
                arr = np.asarray(v)
                return arr[i] if arr.ndim >= 1 and len(arr) == batch else arr
            return v

        for i in range(batch):
            md = {k: _per_sample(v, i)
                  for k, v in metadata.items() if k != "save_fn"}
            fn = save_fns[i] if isinstance(save_fns, list) else save_fns
            if fn is not None and self._saved < self.max_save_images:
                self._futures.append(
                    self._pool.submit(fn, images_uint8[i], md, self.root)
                )
                self._saved += 1
        if self.save_compressed:
            # multi-host: each process appends its own shard; rank 0 merges in
            # on_predict_end via per-host npz files (ICI all_gather of uint8
            # images would waste interconnect for a host-side artifact).
            self._accum.append(images_uint8)

    def on_predict_end(self) -> Optional[str]:
        for f in self._futures:
            f.result()
        self._pool.shutdown()
        if not self.save_compressed or not self._accum:
            return None
        import jax

        arr = np.concatenate(self._accum, axis=0)
        rank = jax.process_index()
        if jax.process_count() > 1:
            shard_path = os.path.join(self.root, f"output_rank{rank}.npz")
            np.savez(shard_path, arr_0=arr)
            # all ranks must reach the barrier (sync is collective); rank 0
            # then merges the on-disk shards
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("save_images_npz")
            if rank != 0:
                return shard_path
            shards = [
                np.load(os.path.join(self.root, f"output_rank{r}.npz"))["arr_0"]
                for r in range(jax.process_count())
            ]
            arr = np.concatenate(shards, axis=0)
        out_path = os.path.join(self.root, "output.npz")
        np.savez(out_path, arr_0=arr)  # ADM suite expects key arr_0
        return out_path


class ComputeMetricsHook:
    """Streaming PSNR/SSIM (+ optional in-framework FID) over predicted vs
    original batches.

    TPU-native equivalent of the reference's three ComputeMetricsHook variants
    (``src/callbacks/compute_metrics*.py:12`` of hhhhzp/DeCo): torchmetrics'
    internal DDP sync becomes an explicit cross-host merge of the streaming
    statistics (``multihost_utils.process_allgather``); Inception features come
    from the Flax tower in :mod:`deco_tpu.models.inception`.
    """

    def __init__(self, compute_fid: bool = True, fid_feature_dim: int = 2048,
                 data_range: float = 255.0, inception_variables=None):
        self.compute_fid = compute_fid
        self.data_range = data_range
        self.inception_variables = inception_variables
        self._fid_dim = fid_feature_dim
        self.reset()

    def reset(self):
        from deco_tpu.train.metrics import FIDStats

        # torchmetrics-protocol accumulators (compute_metrics.py:27-28, the
        # variant every shipped config selects): PSNR pools ONE global SSE
        # over the epoch (dim=None), SSIM sums per-image means. Plain sums
        # merge exactly across batches and hosts.
        self._sse = 0.0
        self._n_obs = 0.0
        self._ssim_sum = 0.0
        self._n_images = 0.0
        self._real = FIDStats(self._fid_dim)
        self._fake = FIDStats(self._fid_dim)
        self._inception_apply = None

    @property
    def has_updates(self) -> bool:
        """True once at least one batch flowed through ``on_batch_end``."""
        return bool(self._n_images)

    def _features(self, images_uint8: np.ndarray) -> np.ndarray:
        import jax
        import jax.numpy as jnp

        from deco_tpu.models.inception import InceptionV3Features

        if self._inception_apply is None:
            # feature_dim selects the torchmetrics tap (64/192/768/2048)
            model = InceptionV3Features(feature_dim=self._fid_dim)
            if self.inception_variables is None:
                import warnings

                warnings.warn(
                    "ComputeMetricsHook FID with a randomly initialized "
                    "Inception tower — self-consistent, not comparable to "
                    "published FIDs (load converted torchvision weights)."
                )
                self.inception_variables = model.init(
                    jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
                )
            self._inception_apply = jax.jit(
                lambda v, x: model.apply(v, x)
            )
        x01 = jnp.asarray(images_uint8, jnp.float32) / 255.0
        return np.asarray(self._inception_apply(self.inception_variables, x01))

    def on_batch_end(self, pred_uint8: np.ndarray, original_uint8: np.ndarray):
        """Both (B, H, W, 3) uint8 host arrays (fp2uint8 output)."""
        import jax.numpy as jnp

        from deco_tpu.train.metrics import squared_error_stats, ssim

        # torchmetrics with a (0, range) tuple clamps before updating
        # (no-op for uint8-sourced inputs, kept for exact protocol).
        p = jnp.clip(jnp.asarray(pred_uint8, jnp.float32), 0, self.data_range)
        o = jnp.clip(jnp.asarray(original_uint8, jnp.float32), 0,
                     self.data_range)
        sse, n = squared_error_stats(p, o)
        self._sse += sse
        self._n_obs += n
        self._ssim_sum += float(jnp.sum(
            ssim(p, o, data_range=self.data_range, per_image=True)))
        self._n_images += float(p.shape[0])
        if self.compute_fid:
            self._real.update(self._features(original_uint8))
            self._fake.update(self._features(pred_uint8))

    def on_epoch_end(self, prefix: str = "metrics") -> dict:
        import jax

        from deco_tpu.train.metrics import frechet_distance, psnr_from_stats

        sse, n_obs = self._sse, self._n_obs
        ssim_sum, n_images = self._ssim_sum, self._n_images
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            gathered = multihost_utils.process_allgather(
                np.asarray([sse, n_obs, ssim_sum, n_images])
            )
            sse, n_obs, ssim_sum, n_images = gathered.sum(0)
            for stats in (self._real, self._fake):
                parts = multihost_utils.process_allgather(
                    np.concatenate([[stats.n], stats.s1, stats.s2.ravel()])
                )
                total = parts.sum(0)
                stats.n = int(total[0])
                d = stats.s1.shape[0]
                stats.s1 = total[1:1 + d]
                stats.s2 = total[1 + d:].reshape(d, d)
        out = {}
        if n_images:
            out[f"{prefix}/psnr"] = psnr_from_stats(
                sse, n_obs, data_range=self.data_range)
            out[f"{prefix}/ssim"] = ssim_sum / n_images
        if self.compute_fid and self._real.n > 1:
            out[f"{prefix}/fid"] = frechet_distance(
                *self._real.finalize(), *self._fake.finalize()
            )
        self.reset()
        return out


class ImageLogger:
    """Predict/validate-time image logging (reference W&B image logging,
    ``src/lightning_uniflow_model.py:447-473`` and trajectory GIFs
    ``app.py:115-134`` of hhhhzp/DeCo): side-by-side original|reconstruction
    panels and denoising-trajectory strips written as PNGs under the workdir
    and mirrored to TensorBoard when a writer is available."""

    def __init__(self, workdir: str, subdir: str = "images",
                 max_images: int = 16, tb_writer=None, wandb_run=None):
        self.root = os.path.join(workdir, subdir)
        os.makedirs(self.root, exist_ok=True)
        self.max_images = max_images
        self._tb = tb_writer
        self._wandb = wandb_run
        self._count = 0

    def _write(self, panel_uint8: np.ndarray, name: str, step: int):
        from PIL import Image

        Image.fromarray(panel_uint8).save(
            os.path.join(self.root, f"{name}_step{step}_{self._count:03d}.png")
        )
        if self._wandb is not None:
            import wandb

            self._wandb.log({f"images/{name}": wandb.Image(panel_uint8)},
                            step=step)
        if self._tb is not None:
            self._tb.add_image(
                f"images/{name}", panel_uint8, step, dataformats="HWC"
            )

    def log_side_by_side(self, step: int, originals_uint8: np.ndarray,
                         recons_uint8: np.ndarray, name: str = "reconstruction"):
        """(B,H,W,3) uint8 pairs -> horizontal original|recon panels."""
        n = min(len(originals_uint8), self.max_images - self._count)
        for i in range(max(n, 0)):
            panel = np.concatenate(
                [originals_uint8[i], recons_uint8[i]], axis=1
            )
            self._write(panel, name, step)
            self._count += 1

    def log_images(self, step: int, images_uint8: np.ndarray,
                   name: str = "samples"):
        """(B,H,W,3) uint8 generated samples, one panel each (the c2i/t2i
        predict path has no 'original' to pair with)."""
        n = min(len(images_uint8), self.max_images - self._count)
        for i in range(max(n, 0)):
            self._write(images_uint8[i], name, step)
            self._count += 1

    def log_trajectory(self, step: int, traj_uint8: np.ndarray,
                       name: str = "trajectory"):
        """(T,H,W,3) uint8 denoising trajectory -> one horizontal strip."""
        if self._count >= self.max_images:
            return
        strip = np.concatenate(list(traj_uint8), axis=1)
        self._write(strip, name, step)
        self._count += 1

    def reset(self):
        self._count = 0


def _maybe_wandb(workdir: str, project: Optional[str], config: Optional[dict]):
    """Import-gated W&B run (reference WandbLogger,
    ``configs/vae_training.yaml:16-19`` / ``train.py`` of hhhhzp/DeCo).

    Activated by ``project`` or the ``WANDB_PROJECT`` env var when the
    ``wandb`` package is importable; this image ships without it, so zero-
    egress environments silently keep the JSONL+TB path (PARITY §2.12)."""
    project = project or os.environ.get("WANDB_PROJECT")
    if not project:
        return None
    try:
        import wandb

        return wandb.init(project=project, dir=workdir,
                          name=os.path.basename(os.path.abspath(workdir)),
                          config=config, resume="allow")
    except Exception:
        return None


class ScalarLogger:
    """JSONL + optional TensorBoard + optional W&B step-scalar logger."""

    def __init__(self, workdir: str, use_tensorboard: bool = True,
                 log_every_n_steps: int = 50,
                 wandb_project: Optional[str] = None,
                 run_config: Optional[dict] = None):
        os.makedirs(workdir, exist_ok=True)
        self.path = os.path.join(workdir, "metrics.jsonl")
        self._fh = open(self.path, "a")
        self.log_every_n_steps = log_every_n_steps
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(os.path.join(workdir, "tb"))
            except Exception:
                self._tb = None
        self._wandb = _maybe_wandb(workdir, wandb_project, run_config)
        self._t0 = time.time()

    def log(self, step: int, metrics: dict, force: bool = False):
        if not force and step % self.log_every_n_steps != 0:
            return
        record = {"step": int(step), "time": round(time.time() - self._t0, 3)}
        for k, v in metrics.items():
            try:
                record[k] = float(v)
            except (TypeError, ValueError):
                continue
        self._fh.write(json.dumps(record) + "\n")
        self._fh.flush()
        if self._tb is not None:
            for k, v in record.items():
                if k not in ("step", "time"):
                    self._tb.add_scalar(k, v, step)
        if self._wandb is not None:
            self._wandb.log(
                {k: v for k, v in record.items() if k != "step"}, step=step)

    def close(self):
        self._fh.close()
        if self._tb is not None:
            self._tb.close()
        if self._wandb is not None:
            self._wandb.finish()
