"""JSONL annotation datasets with retry-on-bad-sample semantics.

Parity with reference ``PixJSONLDataset``/``PixMultiJSONLDataset``
(``src/data/dataset/imagenet.py:222-526`` of hhhhzp/DeCo): orjson-parsed
annotations (stdlib json fallback), ``target_image`` relative paths, seeded
subsampling, multi-source merge with ``repeat_time`` (the
``scripts/total_images.json`` config format), and a bounded retry loop that
resamples a random index when decode fails.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np
from PIL import Image

from deco_tpu.data.imagenet import adm_center_crop

try:
    import orjson

    _loads = orjson.loads
except ImportError:  # orjson not baked in; stdlib json is behaviorally equal
    _loads = json.loads


def _load_jsonl(path: str):
    samples = []
    with open(path, "rb") as f:
        for line in f:
            line = line.strip()
            if line:
                item = _loads(line)
                if "target_image" in item:
                    samples.append(item)
    return samples


class PixJSONLDataset:
    def __init__(self, root: str, annotation: str, resolution: int = 256,
                 random_crop: bool = False, random_flip: bool = False,
                 max_num_samples: Optional[int] = None, seed: int = 42,
                 max_retries: int = 5):
        self.root = root
        self.resolution = resolution
        self.random_crop = random_crop
        self.random_flip = random_flip
        self.max_retries = max_retries
        self._rng = np.random.RandomState(seed)
        self.samples = _load_jsonl(annotation)
        if max_num_samples is not None and max_num_samples < len(self.samples):
            rng = np.random.RandomState(42)
            idx = rng.choice(len(self.samples), size=max_num_samples,
                             replace=False)
            self.samples = [self.samples[i] for i in idx]

    def __len__(self):
        return len(self.samples)

    def _load_one(self, idx: int):
        item = self.samples[idx]
        path = os.path.join(self.root, item["target_image"])
        img = Image.open(path).convert("RGB")
        if self.random_crop:
            w, h = img.size
            scale = self.resolution / min(w, h)
            img = img.resize((round(w * scale), round(h * scale)), Image.BICUBIC)
            arr = np.array(img)
            my, mx = arr.shape[0] - self.resolution, arr.shape[1] - self.resolution
            y0 = self._rng.randint(0, my + 1) if my > 0 else 0
            x0 = self._rng.randint(0, mx + 1) if mx > 0 else 0
            arr = arr[y0:y0 + self.resolution, x0:x0 + self.resolution]
            if self._rng.rand() < 0.5:
                arr = arr[:, ::-1]
        else:
            arr = np.array(adm_center_crop(img, self.resolution))
            if self.random_flip and self._rng.rand() < 0.5:
                arr = arr[:, ::-1]
        raw = arr.astype(np.float32) / 255.0
        x = raw * 2.0 - 1.0
        return x, 0, {"raw_image": raw, "class": 0}

    def __getitem__(self, idx: int):
        for attempt in range(self.max_retries):
            try:
                if attempt > 0:
                    idx = int(self._rng.randint(0, len(self.samples)))
                return self._load_one(idx)
            except Exception as e:  # retry-on-bad-sample (imagenet.py:296-341)
                if attempt == self.max_retries - 1:
                    raise RuntimeError(
                        f"Failed to load sample after {self.max_retries} "
                        f"attempts: {e}"
                    )


class PixMultiJSONLDataset(PixJSONLDataset):
    """Multi-source merge driven by a JSON config with repeat_time weights."""

    def __init__(self, config_path: str, resolution: int = 256,
                 random_crop: bool = False, random_flip: bool = False,
                 max_num_samples: Optional[int] = None, seed: int = 42,
                 max_retries: int = 5):
        self.resolution = resolution
        self.random_crop = random_crop
        self.random_flip = random_flip
        self.max_retries = max_retries
        self._rng = np.random.RandomState(seed)
        with open(config_path, "rb") as f:
            config = _loads(f.read())
        self.samples = []
        self.dataset_names = []
        for name, dcfg in config.items():
            root = dcfg["root"]
            repeat = int(dcfg.get("repeat_time", 1))
            entries = _load_jsonl(dcfg["annotation"])
            for item in entries:
                item = dict(item)
                item["target_image"] = os.path.join(root, item["target_image"])
                for _ in range(repeat):
                    self.samples.append(item)
            self.dataset_names.append(name)
        if max_num_samples is not None and max_num_samples < len(self.samples):
            rng = np.random.RandomState(42)
            idx = rng.choice(len(self.samples), size=max_num_samples,
                             replace=False)
            self.samples = [self.samples[i] for i in idx]
        self.root = ""  # paths already absolute after merge
