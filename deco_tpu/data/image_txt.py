"""Image+caption-pair folder dataset (BLIP3o-60k SFT layout).

Parity with reference ``src/data/dataset/image_txt.py:15-54`` (hhhhzp/DeCo):
each image has a same-name .txt caption; resize short side + center crop.
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

IMG_EXTS = (".png", ".jpg", ".jpeg", ".JPEG")


class ImageText:
    def __init__(self, root: str, resolution: int):
        self.image_paths, self.texts = [], []
        for dirpath, _, files in sorted(os.walk(root)):
            for f in sorted(files):
                if f.endswith(IMG_EXTS):
                    image_path = os.path.join(dirpath, f)
                    text_path = os.path.splitext(image_path)[0] + ".txt"
                    if os.path.exists(text_path):
                        with open(text_path) as fh:
                            self.texts.append(fh.read())
                        self.image_paths.append(image_path)
        self.resolution = resolution

    def __len__(self):
        return len(self.image_paths)

    def __getitem__(self, idx: int):
        path = self.image_paths[idx]
        text = self.texts[idx]
        img = Image.open(path).convert("RGB")
        # Resize(short side) + CenterCrop
        w, h = img.size
        scale = self.resolution / min(w, h)
        img = img.resize((round(w * scale), round(h * scale)), Image.BICUBIC)
        arr = np.array(img)
        y0 = (arr.shape[0] - self.resolution) // 2
        x0 = (arr.shape[1] - self.resolution) // 2
        arr = arr[y0 : y0 + self.resolution, x0 : x0 + self.resolution]
        raw = arr.astype(np.float32) / 255.0
        x = raw * 2.0 - 1.0
        return x, text, {"image_path": path, "prompt": text, "raw_image": raw}
