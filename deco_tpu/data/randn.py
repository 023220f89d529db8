"""Deterministic eval-noise datasets for FID/GenEval sampling.

Parity with reference ``src/data/dataset/randn.py`` (hhhhzp/DeCo): each sample
is seeded noise + a condition + a ``save_fn`` closure. Noise streams use
numpy's Philox counter RNG keyed on the seed — the *protocol* (counts, class
cycling, per-sample seeds, file layout) matches the reference exactly; the
bit-stream differs from ``torch.Generator`` (SURVEY §7: FID-level parity is
the metric; ``noise_file`` mode gives bit-exact A/B when needed).

Latent shapes in configs are CHW (reference convention); outputs are NHWC.
"""

from __future__ import annotations

import os
import re
import unicodedata
from typing import List, Optional, Union

import numpy as np
from PIL import Image


def clean_filename(s: str) -> str:
    """Filename sanitization (reference randn.py:11-41)."""
    s = s.strip().strip(".")
    s = unicodedata.normalize("NFKD", s).encode("ASCII", "ignore").decode("ASCII")
    s = re.sub(r"[/]", "_", s)
    s = re.sub(r"_{2,}", "_", s)
    s = s.lower()
    return s[:200] or "untitled"


def save_fn(image: np.ndarray, metadata: dict, root_path: str):
    Image.fromarray(image).save(
        os.path.join(root_path, str(metadata["filename"]) + ".png")
    )


def seeded_noise(seed: int, chw_shape) -> np.ndarray:
    """Deterministic noise for one sample, returned HWC."""
    rng = np.random.Generator(np.random.Philox(seed))
    c, h, w = chw_shape
    return rng.standard_normal((h, w, c), dtype=np.float32)


class RandomNDataset:
    """Seeded-noise dataset (reference randn.py:38-84)."""

    def __init__(
        self,
        latent_shape=(4, 64, 64),
        conditions: Union[int, List, str, None] = None,
        seeds: Optional[List[int]] = None,
        max_num_instances: int = 50000,
        num_samples_per_instance: int = -1,
        noise_file: Optional[str] = None,
        deterministic_seeds: bool = True,
    ):
        if isinstance(conditions, int):
            conditions = list(range(conditions))
        elif isinstance(conditions, str):
            if os.path.exists(conditions):
                conditions = open(conditions).read().splitlines()
            else:
                raise FileNotFoundError(conditions)
        self.conditions = conditions
        self.num_conditions = len(conditions)
        self.seeds = seeds
        if num_samples_per_instance > 0:
            max_num_instances = num_samples_per_instance * self.num_conditions
        if seeds is not None:
            self.max_num_instances = len(seeds) * self.num_conditions
            self.num_seeds = len(seeds)
        else:
            self.num_seeds = (
                max_num_instances + self.num_conditions - 1
            ) // self.num_conditions
            self.max_num_instances = self.num_seeds * self.num_conditions
        self.latent_shape = tuple(latent_shape)
        self.deterministic_seeds = deterministic_seeds
        # bit-exact A/B mode: load noise from an .npy memmap (N, H, W, C)
        self._noise = np.load(noise_file, mmap_mode="r") if noise_file else None

    def _seed_for(self, idx: int) -> int:
        if self.seeds is not None:
            return self.seeds[idx % self.num_seeds]
        if self.deterministic_seeds:
            # deterministic per-index (the reference draws random seeds at
            # iteration time, randn.py:71 — deterministic is strictly better
            # for reproducible FID; flip the flag for reference behavior)
            return idx % self.num_seeds
        return int(np.random.randint(0, 1 << 31))

    def __len__(self):
        return self.max_num_instances

    def __getitem__(self, idx: int):
        condition = self.conditions[idx // self.num_seeds]
        seed = self._seed_for(idx)
        filename = f"{clean_filename(str(condition))}_{seed}"
        if self._noise is not None:
            latent = np.asarray(self._noise[idx], np.float32)
        else:
            latent = seeded_noise(seed, self.latent_shape)
        metadata = dict(
            filename=filename, seed=seed, condition=condition, save_fn=save_fn
        )
        return latent, condition, metadata


class ClassLabelRandomNDataset(RandomNDataset):
    """1000-classes x 50-seeds FID protocol dataset (randn.py:86-91)."""

    def __init__(self, latent_shape=(4, 64, 64), num_classes: int = 1000,
                 conditions=None, seeds=None, max_num_instances: int = 50000,
                 num_samples_per_instance: int = -1, **kw):
        if conditions is None:
            conditions = list(range(num_classes))
        super().__init__(
            latent_shape, conditions, seeds, max_num_instances,
            num_samples_per_instance, **kw,
        )
