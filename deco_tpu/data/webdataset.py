"""Streaming WebDataset reader (tar shards) with per-process sharding.

TPU-native equivalent of the reference's ``PixWebDataset``
(``src/data/dataset/imagenet.py:534-671`` of hhhhzp/DeCo): the HF
``load_dataset("webdataset", streaming=True)`` pipeline becomes a direct
tarfile stream (zero-egress environment — shards are local files; remote HF
streaming is gated), sharded by ``jax.process_index()`` instead of
``dist.get_rank()``. Semantics preserved:

- shard-level shuffle + 1000-sample buffer shuffle, seeded (``:636``);
- one-shot sharding so no sample repeats across processes (``:648-651``);
- ADM center crop (or random crop) + optional flip + [-1, 1] normalize;
- skip-bad-sample iteration with a warning (``:658-671``);
- metadata carries ``raw_image`` in [0, 1] and ``class`` (from the ``.cls``
  member when present, else 0).
"""

from __future__ import annotations

import glob
import io
import os
import random
import tarfile
import warnings
from typing import Iterator, List, Optional, Sequence, Union

import numpy as np

from deco_tpu.data.imagenet import adm_center_crop

_IMAGE_EXT = (".jpg", ".jpeg", ".png", ".webp")


class PixWebDataset:
    """Iterable over webdataset tar shards -> (x, class, metadata)."""

    def __init__(
        self,
        data_files: Union[str, Sequence[str]],
        resolution: int = 256,
        random_crop: bool = False,
        random_flip: bool = False,
        is_train: bool = True,
        random_seed: int = 42,
        buffer_size: int = 1000,
        cache_dir: Optional[str] = None,  # accepted for config parity
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
    ):
        if isinstance(data_files, str):
            files = sorted(glob.glob(data_files)) or [data_files]
        else:
            files = list(data_files)
        missing = [f for f in files if not os.path.exists(f)]
        if missing:
            raise FileNotFoundError(
                f"webdataset shards not found: {missing[:3]} (remote HF "
                "streaming is unavailable in this environment; pass local "
                ".tar shards)"
            )
        self.files: List[str] = files
        self.resolution = resolution
        self.random_crop = random_crop
        self.random_flip = random_flip
        self.is_train = is_train
        self.seed = random_seed
        self.buffer_size = buffer_size
        self._epoch = 0
        if process_index is None or process_count is None:
            import jax

            process_index = jax.process_index()
            process_count = jax.process_count()
        self.rank = process_index
        self.world = process_count

    # -- sample processing ---------------------------------------------------

    def _process(self, image_bytes: bytes, target: int, rng: random.Random):
        from PIL import Image

        if not self.random_crop:
            # hot path: native decode + ADM crop when built
            # (deco_tpu/data/native.py; PIL-parity within 1 LSB)
            from deco_tpu.data import native

            if native.available():
                arr = native.decode_jpeg_adm(image_bytes, self.resolution)
                if arr is not None:
                    if self.random_flip and rng.random() < 0.5:
                        arr = arr[:, ::-1]
                    raw = np.ascontiguousarray(arr, np.float32) / 255.0
                    return raw * 2.0 - 1.0, int(target), {
                        "raw_image": raw, "class": int(target)}

        img = Image.open(io.BytesIO(image_bytes)).convert("RGB")
        if self.random_crop:
            w, h = img.size
            scale = self.resolution / min(w, h)
            img = img.resize((round(w * scale), round(h * scale)))
            x0 = rng.randint(0, img.size[0] - self.resolution)
            y0 = rng.randint(0, img.size[1] - self.resolution)
            img = img.crop((x0, y0, x0 + self.resolution, y0 + self.resolution))
        else:
            img = adm_center_crop(img, self.resolution)
        if self.random_flip and rng.random() < 0.5:
            img = img.transpose(0)  # FLIP_LEFT_RIGHT
        raw = np.asarray(img, np.float32) / 255.0  # HWC [0,1]
        x = raw * 2.0 - 1.0
        return x, int(target), {"raw_image": raw, "class": int(target)}

    # -- stream --------------------------------------------------------------

    def _grouped_members(self, path: str):
        """Yield (image_bytes, cls) per webdataset sample key within one tar."""
        with tarfile.open(path, "r|*") as tf:  # streaming mode
            current_key, img_bytes, cls = None, None, 0
            for member in tf:
                if not member.isfile():
                    continue
                base = os.path.basename(member.name)
                key, ext = os.path.splitext(base)
                ext = ext.lower()
                if key != current_key:
                    if img_bytes is not None:
                        yield img_bytes, cls
                    current_key, img_bytes, cls = key, None, 0
                data = tf.extractfile(member)
                if data is None:
                    continue
                if ext in _IMAGE_EXT:
                    img_bytes = data.read()
                elif ext == ".cls":
                    try:
                        cls = int(data.read().decode().strip())
                    except ValueError:
                        cls = 0
            if img_bytes is not None:
                yield img_bytes, cls

    def __iter__(self) -> Iterator:
        epoch = self._epoch
        self._epoch += 1
        rng = random.Random(self.seed + epoch)
        files = list(self.files)
        if self.is_train:
            rng.shuffle(files)

        def raw_stream():
            # one-shot sharding: global sample index striped over processes,
            # so no sample is seen by two processes (imagenet.py:648-651)
            idx = 0
            for path in files:
                try:
                    for img_bytes, cls in self._grouped_members(path):
                        if idx % self.world == self.rank:
                            yield img_bytes, cls
                        idx += 1
                except (tarfile.TarError, OSError) as e:
                    warnings.warn(f"[rank {self.rank}] skipping bad shard "
                                  f"{path}: {e}")

        buffer: list = []
        for item in raw_stream():
            if not self.is_train or self.buffer_size <= 1:
                out = item
            else:
                buffer.append(item)
                if len(buffer) < self.buffer_size:
                    continue
                j = rng.randrange(len(buffer))
                buffer[j], out = buffer[-1], buffer[j]
                buffer.pop()
            try:
                yield self._process(out[0], out[1], rng)
            except Exception as e:  # skip bad samples (imagenet.py:665-671)
                warnings.warn(f"[rank {self.rank}] skipping bad sample: {e}")
        while buffer:
            j = rng.randrange(len(buffer))
            buffer[j], out = buffer[-1], buffer[j]
            buffer.pop()
            try:
                yield self._process(out[0], out[1], rng)
            except Exception as e:
                warnings.warn(f"[rank {self.rank}] skipping bad sample: {e}")
