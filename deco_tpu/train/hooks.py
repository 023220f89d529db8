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
        for i in range(batch):
            md = {k: (v[i] if isinstance(v, (list, np.ndarray)) else v)
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


class ScalarLogger:
    """JSONL + optional TensorBoard step-scalar logger."""

    def __init__(self, workdir: str, use_tensorboard: bool = True,
                 log_every_n_steps: int = 50):
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

    def close(self):
        self._fh.close()
        if self._tb is not None:
            self._tb.close()
