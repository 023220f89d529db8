"""GenEval prompt dataset + exact scorer file layout.

Parity with reference ``src/data/dataset/geneval.py:8-45`` (hhhhzp/DeCo):
writes ``<idx>/samples/<seed>.png`` + ``metadata.jsonl`` as GenEval's scorer
expects.
"""

from __future__ import annotations

import copy
import json
import os

import numpy as np
from PIL import Image

from deco_tpu.data.randn import seeded_noise


def _jsonable(v):
    """Loader collates turn ints/floats into numpy scalars and lists into
    arrays, and conditioners write device arrays (valid_length_y) into
    metadata; the scorer metadata must stay plain JSON."""
    if isinstance(v, np.generic):
        return v.item()
    if isinstance(v, np.ndarray):
        return v.tolist()
    if hasattr(v, "__array__") and not isinstance(v, (str, bytes)):
        arr = np.asarray(v)
        return arr.item() if arr.ndim == 0 else arr.tolist()
    return v


def geneval_save_fn(image: np.ndarray, metadata: dict, root_path: str):
    path = os.path.join(root_path, str(metadata["filename"]))
    os.makedirs(os.path.join(path, "samples"), exist_ok=True)
    Image.fromarray(image).save(
        os.path.join(path, "samples", f"{_jsonable(metadata['seed'])}.png")
    )
    clean = {k: _jsonable(v) for k, v in metadata.items() if k != "save_fn"}
    with open(os.path.join(path, "metadata.jsonl"), "w") as fp:
        json.dump(clean, fp)


class GenEvalDataset:
    def __init__(self, meta_json_path: str, num_samples_per_instance: int,
                 latent_shape):
        self.latent_shape = tuple(latent_shape)
        with open(meta_json_path) as fp:
            self.metadatas = [json.loads(line) for line in fp]
        self.num_instances = len(self.metadatas)
        self.num_samples_per_instance = num_samples_per_instance
        self.num_samples = self.num_instances * num_samples_per_instance

    def __len__(self):
        return self.num_samples

    def __getitem__(self, idx: int):
        instance_idx = idx // self.num_samples_per_instance
        sample_idx = idx % self.num_samples_per_instance
        metadata = copy.deepcopy(self.metadatas[instance_idx])
        condition = metadata["prompt"]
        latent = seeded_noise(sample_idx, self.latent_shape)
        metadata["seed"] = sample_idx
        metadata["filename"] = f"{idx}"
        metadata["save_fn"] = geneval_save_fn
        return latent, condition, metadata
