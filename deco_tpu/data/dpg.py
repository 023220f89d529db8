"""DPG prompt dataset + 2x2 grid concat tool.

Parity with reference ``src/data/dataset/dpg.py:8-41`` and the post-hoc grid
tool ``evaluations/dpg/dpg_cat_image.py:17-41`` (hhhhzp/DeCo).
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

from deco_tpu.data.randn import seeded_noise


def dpg_save_fn(image: np.ndarray, metadata: dict, root_path: str):
    Image.fromarray(image).save(
        os.path.join(
            root_path, f"{metadata['filename']}_{metadata['seed']}.png"
        )
    )


class DPGDataset:
    def __init__(self, prompt_path: str, num_samples_per_instance: int,
                 latent_shape):
        self.latent_shape = tuple(latent_shape)
        self.prompts, self.filenames = [], []
        for prompt_file in sorted(os.listdir(prompt_path)):
            with open(os.path.join(prompt_path, prompt_file)) as fp:
                self.prompts.append(fp.readline().strip())
            self.filenames.append(prompt_file.replace(".txt", ""))
        self.num_instances = len(self.prompts)
        self.num_samples_per_instance = num_samples_per_instance
        self.num_samples = self.num_instances * num_samples_per_instance

    def __len__(self):
        return self.num_samples

    def __getitem__(self, idx: int):
        instance_idx = idx // self.num_samples_per_instance
        sample_idx = idx % self.num_samples_per_instance
        metadata = dict(
            prompt=self.prompts[instance_idx],
            filename=self.filenames[instance_idx],
            seed=sample_idx,
            save_fn=dpg_save_fn,
        )
        latent = seeded_noise(sample_idx, self.latent_shape)
        return latent, metadata["prompt"], metadata


def concat_dpg_grids(sample_dir: str, out_dir: str, num_samples: int = 4):
    """2x2 grid concat for the DPG scorer (dpg_cat_image.py:17-41)."""
    os.makedirs(out_dir, exist_ok=True)
    names = {}
    for f in sorted(os.listdir(sample_dir)):
        if not f.endswith(".png"):
            continue
        stem, seed = f.rsplit("_", 1)
        names.setdefault(stem, []).append(os.path.join(sample_dir, f))
    for stem, paths in names.items():
        imgs = [np.array(Image.open(p)) for p in sorted(paths)[:num_samples]]
        h, w = imgs[0].shape[:2]
        grid = np.zeros((2 * h, 2 * w, imgs[0].shape[2]), imgs[0].dtype)
        for i, img in enumerate(imgs):
            r, c = divmod(i, 2)
            grid[r * h : (r + 1) * h, c * w : (c + 1) * w] = img
        Image.fromarray(grid).save(os.path.join(out_dir, stem + ".png"))
