"""Streaming packed datasets: parquet shards and webdataset tars (t2i).

Parity with reference ``src/data/dataset/blip3o_dataset.py:50-327``
(hhhhzp/DeCo): infinite iterable over parquet shards with caption-source
weighting, short-caption prefix templates, min-resolution filtering and
skip-bad-sample behavior; plus a webdataset-style tar reader. Sharding is by
``jax.process_index`` over shard files (replaces torch worker_info sharding,
SURVEY §2.10).
"""

from __future__ import annotations

import io
import os
import random
import tarfile
from typing import Dict, Iterator, Optional

import numpy as np
from PIL import Image


PREFIX_TEMPLATES = [
    "A photo of ",
    "A picture of ",
    "A visual representation of ",
    "A image of ",
    "A scene of ",
    "A view of ",
    "A depiction of ",
]


def _process_image(pil_image: Image.Image, resolution: int, random_crop: bool,
                   rng: random.Random):
    if min(pil_image.size) < resolution:
        return None
    w, h = pil_image.size
    scale = resolution / min(w, h)
    pil_image = pil_image.resize(
        (round(w * scale), round(h * scale)), Image.BICUBIC
    )
    arr = np.array(pil_image)
    if random_crop:
        my, mx = arr.shape[0] - resolution, arr.shape[1] - resolution
        y0 = rng.randint(0, my) if my > 0 else 0
        x0 = rng.randint(0, mx) if mx > 0 else 0
    else:
        y0 = (arr.shape[0] - resolution) // 2
        x0 = (arr.shape[1] - resolution) // 2
    arr = arr[y0:y0 + resolution, x0:x0 + resolution]
    raw = arr.astype(np.float32) / 255.0
    return raw * 2.0 - 1.0, raw


class PackedParquetDataset:
    """Infinite iterable over parquet shards of (image bytes, captions)."""

    def __init__(self, data_sources: Dict[str, int],
                 caption_weight: Dict[str, float], resolution: int = 256,
                 random_crop: bool = False, seed: int = 0,
                 shard_index: Optional[int] = None,
                 shard_count: Optional[int] = None):
        self.resolution = resolution
        self.random_crop = random_crop
        self.caption_weight = caption_weight
        self.parquet_files = []
        for root, repeat in data_sources.items():
            files = sorted(
                os.path.join(root, f) for f in os.listdir(root)
                if f.endswith(".parquet")
            )
            self.parquet_files.extend(files * int(repeat))
        if shard_index is None:
            import jax

            shard_index = jax.process_index()
            shard_count = jax.process_count()
        self._files = self.parquet_files[shard_index::max(shard_count, 1)]
        self._rng = random.Random(seed + shard_index)

    def __iter__(self) -> Iterator:
        import pyarrow.parquet as pq

        rng = self._rng
        keys = list(self.caption_weight.keys())
        probs = np.asarray(list(self.caption_weight.values()), np.float64)
        probs = probs / probs.sum()
        while True:
            file = rng.choice(self._files)
            table = pq.read_table(file)
            order = np.random.RandomState(rng.randint(0, 2**31)).permutation(
                table.num_rows
            )
            for i in order.tolist():
                record = {c: table[c][i].as_py() for c in table.column_names}
                caption_key = np.random.choice(keys, p=probs)
                if caption_key not in record:
                    continue
                caption = record[caption_key]
                if rng.random() < 0.5 and "long" not in caption_key:
                    caption = rng.choice(PREFIX_TEMPLATES) + caption
                try:
                    img = Image.open(io.BytesIO(record["image"])).convert("RGB")
                    out = _process_image(img, self.resolution, self.random_crop,
                                         rng)
                    if out is None:
                        continue
                    x, raw = out
                    yield x, caption, {"raw_image": raw, "prompt": caption}
                except Exception:
                    continue  # skip-bad-sample (blip3o_dataset.py:141)


class WebDatasetPacked:
    """Webdataset-style tar shards of (jpg/png + txt/json caption) pairs.

    Reference ``WebDatasetPackedDataset`` (:145-327) uses the webdataset
    library over remote urls; this reads local tar shards with the same
    pairing convention, shuffle buffer, and repeat semantics.
    """

    def __init__(self, urls, resolution: int = 512, random_crop: bool = False,
                 shuffle_buffer: int = 1000, repeat: bool = True,
                 caption_key: str = "txt", seed: int = 0,
                 shard_index: Optional[int] = None,
                 shard_count: Optional[int] = None):
        self.resolution = resolution
        self.random_crop = random_crop
        self.shuffle_buffer = shuffle_buffer
        self.repeat = repeat
        self.caption_key = caption_key
        tars = []
        for url in (urls if isinstance(urls, (list, tuple)) else [urls]):
            if os.path.isdir(url):
                tars.extend(
                    sorted(os.path.join(url, f) for f in os.listdir(url)
                           if f.endswith(".tar"))
                )
            else:
                tars.append(url)
        if shard_index is None:
            import jax

            shard_index = jax.process_index()
            shard_count = jax.process_count()
        self._tars = tars[shard_index::max(shard_count, 1)]
        self._rng = random.Random(seed + shard_index)

    def _samples_from_tar(self, path: str):
        groups: Dict[str, dict] = {}
        with tarfile.open(path) as tf:
            for member in tf.getmembers():
                if not member.isfile():
                    continue
                stem, ext = os.path.splitext(member.name)
                ext = ext.lstrip(".").lower()
                groups.setdefault(stem, {})[ext] = tf.extractfile(member).read()
        for stem, parts in groups.items():
            img_bytes = parts.get("jpg") or parts.get("jpeg") or parts.get("png")
            cap = parts.get(self.caption_key)
            if img_bytes is None or cap is None:
                continue
            yield img_bytes, cap.decode("utf-8").strip()

    def __iter__(self):
        rng = self._rng
        buffer = []
        while True:
            tars = list(self._tars)
            rng.shuffle(tars)
            for tar in tars:
                try:
                    for img_bytes, caption in self._samples_from_tar(tar):
                        buffer.append((img_bytes, caption))
                        if len(buffer) >= self.shuffle_buffer:
                            i = rng.randrange(len(buffer))
                            buffer[i], buffer[-1] = buffer[-1], buffer[i]
                            item = buffer.pop()
                            out = self._decode(item, rng)
                            if out is not None:
                                yield out
                except Exception:
                    continue
            while buffer:
                out = self._decode(buffer.pop(), rng)
                if out is not None:
                    yield out
            if not self.repeat:
                break

    def _decode(self, item, rng):
        img_bytes, caption = item
        try:
            img = Image.open(io.BytesIO(img_bytes)).convert("RGB")
            out = _process_image(img, self.resolution, self.random_crop, rng)
            if out is None:
                return None
            x, raw = out
            return x, caption, {"raw_image": raw, "prompt": caption}
        except Exception:
            return None
