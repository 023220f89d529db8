"""ImageNet-style folder datasets with the exact ADM center crop.

Parity with reference ``src/data/dataset/imagenet.py`` (hhhhzp/DeCo): the
box-downsample + bicubic + center-crop pipeline is reproduced exactly (it is
critical for FID parity, SURVEY §2.11). Torch-free: PIL + numpy, NHWC float32
in [-1, 1]; ``metadata['raw_image']`` is the un-normalized [0, 1] image as in
the reference.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
from PIL import Image

IMG_EXTS = (".png", ".jpg", ".jpeg", ".JPEG", ".JPG", ".PNG", ".bmp", ".webp")


def adm_center_crop(pil_image: Image.Image, image_size: int) -> Image.Image:
    """ADM/guided-diffusion center crop (reference imagenet.py:12-32)."""
    while min(*pil_image.size) >= 2 * image_size:
        pil_image = pil_image.resize(
            tuple(x // 2 for x in pil_image.size), resample=Image.BOX
        )
    scale = image_size / min(*pil_image.size)
    pil_image = pil_image.resize(
        tuple(round(x * scale) for x in pil_image.size), resample=Image.BICUBIC
    )
    arr = np.array(pil_image)
    crop_y = (arr.shape[0] - image_size) // 2
    crop_x = (arr.shape[1] - image_size) // 2
    return Image.fromarray(
        arr[crop_y : crop_y + image_size, crop_x : crop_x + image_size]
    )


def _scan_image_folder(root: str):
    """ImageFolder-compatible scan: sorted class dirs -> (path, class_idx)."""
    classes = sorted(
        d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
    )
    class_to_idx = {c: i for i, c in enumerate(classes)}
    samples = []
    for c in classes:
        cdir = os.path.join(root, c)
        for dirpath, _, files in sorted(os.walk(cdir)):
            for f in sorted(files):
                if f.endswith(IMG_EXTS):
                    samples.append((os.path.join(dirpath, f), class_to_idx[c]))
    return samples, classes


class PixImageNet:
    """Pixel-space ImageNet: ADM crop -> [-1,1] NHWC (imagenet.py:69-107)."""

    def __init__(self, root: str, resolution: int = 256, random_crop: bool = False,
                 random_flip: bool = False, seed: int = 0):
        self.samples, self.classes = _scan_image_folder(root)
        self.resolution = resolution
        self.random_crop = random_crop
        self.random_flip = random_flip
        self._rng = np.random.RandomState(seed)

    def __len__(self):
        return len(self.samples)

    def _load_center_cropped(self, path: str) -> np.ndarray:
        """ADM center crop via the native data-plane when built (threaded
        libjpeg + PIL-parity resampler, deco_tpu/data/native.py), PIL
        otherwise. Pixel-equivalent within 1 LSB (test_native_dataplane)."""
        if path.lower().endswith((".jpg", ".jpeg")):
            from deco_tpu.data import native

            if native.available():
                with open(path, "rb") as f:
                    arr = native.decode_jpeg_adm(f.read(), self.resolution)
                if arr is not None:
                    return arr
        img = Image.open(path).convert("RGB")
        return np.array(adm_center_crop(img, self.resolution))

    def __getitem__(self, idx: int):
        path, target = self.samples[idx]
        if self.random_crop:
            img = Image.open(path).convert("RGB")
            # Resize(short side) + RandomCrop + flip
            w, h = img.size
            scale = self.resolution / min(w, h)
            img = img.resize((round(w * scale), round(h * scale)), Image.BICUBIC)
            arr = np.array(img)
            max_y = arr.shape[0] - self.resolution
            max_x = arr.shape[1] - self.resolution
            y0 = self._rng.randint(0, max_y + 1) if max_y > 0 else 0
            x0 = self._rng.randint(0, max_x + 1) if max_x > 0 else 0
            arr = arr[y0 : y0 + self.resolution, x0 : x0 + self.resolution]
            if self._rng.rand() < 0.5:
                arr = arr[:, ::-1]
        else:
            arr = self._load_center_cropped(path)
            if self.random_flip and self._rng.rand() < 0.5:
                arr = arr[:, ::-1]
        raw = arr.astype(np.float32) / 255.0  # [0,1] HWC
        x = raw * 2.0 - 1.0
        metadata = {"raw_image": raw, "class": target}
        return x, target, metadata


class LocalCachedDataset(PixImageNet):
    """Precomputed VAE-latent cache variant (imagenet.py:35-66).

    Latents are stored as ``<image_path>.npz`` with mean/logvar arrays under
    ``cache_root``; the posterior is sampled at load time.
    """

    def __init__(self, root: str, resolution: int = 256,
                 cache_root: Optional[str] = None, seed: int = 0):
        super().__init__(root, resolution=resolution, seed=seed)
        self.root = root
        self.cache_root = cache_root

    def __getitem__(self, idx: int):
        path, target = self.samples[idx]
        img = Image.open(path).convert("RGB")
        raw = np.array(adm_center_crop(img, self.resolution)).astype(np.float32) / 255.0
        if self.cache_root is not None:
            lpath = path.replace(self.root, self.cache_root) + ".npz"
            pk = np.load(lpath)
            mean = pk["mean"].astype(np.float32)
            logvar = np.clip(pk["logvar"].astype(np.float32), -30.0, 20.0)
            latent = mean + self._rng.randn(*mean.shape).astype(np.float32) * np.exp(
                0.5 * logvar
            )
        else:
            latent = raw
        metadata = {"raw_image": raw, "class": target}
        return latent, target, metadata


class PixHFDataset:
    """HF `datasets` ImageNet wrapper (imagenet.py:117-215): split + seeded subsample."""

    def __init__(self, dataset_name: str = "imagenet-1k", split: str = "train",
                 resolution: int = 256, num_samples: Optional[int] = None,
                 seed: int = 0, streaming: bool = False):
        import datasets as hfds

        self.ds = hfds.load_dataset(dataset_name, split=split, streaming=streaming)
        self.resolution = resolution
        if num_samples is not None and not streaming:
            rng = np.random.RandomState(seed)
            idx = rng.permutation(len(self.ds))[:num_samples]
            self.ds = self.ds.select(idx)

    def __len__(self):
        return len(self.ds)

    def __getitem__(self, idx: int):
        rec = self.ds[idx]
        img = rec["image"].convert("RGB")
        arr = np.array(adm_center_crop(img, self.resolution))
        raw = arr.astype(np.float32) / 255.0
        x = raw * 2.0 - 1.0
        target = rec.get("label", 0)
        return x, target, {"raw_image": raw, "class": target}
