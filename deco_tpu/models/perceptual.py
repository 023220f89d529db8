"""Perceptual losses: VGG16-LPIPS and ConvNeXt-S feature/logit MSE (Flax).

Parity with reference ``src/models/modules/lpips.py:69-184`` and
``src/models/modules/perceptual_loss.py:28-118`` (hhhhzp/DeCo). The reference
auto-downloads pretrained torch weights; this environment has zero egress, so
towers are architecture-complete with converters
(:func:`vgg16_params_from_torch`, :func:`convnext_s_params_from_torch`) that
map standard torchvision state dicts, and loaders gate on weight availability.
Randomly-initialized towers still provide a meaningful perceptual-style loss
(random-feature distances), so training paths function without downloads —
with a warning that metric values are not comparable to the published setup.

Inputs are NHWC in [0, 1].
"""

from __future__ import annotations

import warnings
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)
# LPIPS input scaling (reference lpips.py ScalingLayer)
LPIPS_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
LPIPS_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
             512, 512, 512, "M", 512, 512, 512, "M"]
# indices (within conv list) after which LPIPS taps features: relu1_2,
# relu2_2, relu3_3, relu4_3, relu5_3
VGG_TAPS = (1, 3, 6, 9, 12)
VGG_TAP_CHANNELS = (64, 128, 256, 512, 512)


class VGG16Features(nn.Module):
    """VGG16 conv tower returning the five LPIPS tap activations."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        taps = []
        conv_idx = 0
        for v in VGG16_CFG:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(v, (3, 3), padding=1, dtype=self.dtype,
                            name=f"conv_{conv_idx}")(x)
                x = nn.relu(x)
                if conv_idx in VGG_TAPS:
                    taps.append(x)
                conv_idx += 1
        return taps


class LPIPS(nn.Module):
    """VGG-LPIPS: unit-normalize tap activations, 1x1 linear weights, mean."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input01, target01):
        def prep(img):
            img = img * 2.0 - 1.0  # [0,1] -> [-1,1] (lpips convention)
            return (img - jnp.asarray(LPIPS_SHIFT)) / jnp.asarray(LPIPS_SCALE)

        tower = VGG16Features(dtype=self.dtype, name="vgg")
        f_in = tower(prep(input01))
        f_tg = tower(prep(target01))
        total = 0.0
        for i, (a, b) in enumerate(zip(f_in, f_tg)):
            a = a / jnp.maximum(
                jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-10
            )
            b = b / jnp.maximum(
                jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-10
            )
            diff = (a - b) ** 2
            # positive init so the random-weight fallback stays a metric
            lin = nn.Conv(1, (1, 1), use_bias=False, dtype=self.dtype,
                          kernel_init=nn.initializers.uniform(scale=0.1),
                          name=f"lin_{i}")(diff)
            total = total + jnp.mean(lin, axis=(1, 2, 3))
        return total  # (B,)


class ConvNeXtBlock(nn.Module):
    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.dim, (7, 7), padding=3, feature_group_count=self.dim,
                    dtype=self.dtype, name="dwconv")(x)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(h)
        h = nn.Dense(4 * self.dim, dtype=self.dtype, name="pw1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, dtype=self.dtype, name="pw2")(h)
        gamma = self.param("gamma", nn.initializers.constant(1e-6),
                           (self.dim,), jnp.float32)
        return x + gamma.astype(self.dtype) * h


class ConvNeXtS(nn.Module):
    """ConvNeXt-Small classifier (depths 3,3,27,3; dims 96,192,384,768)."""

    num_classes: int = 1000
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        depths = (3, 3, 27, 3)
        dims = (96, 192, 384, 768)
        x = nn.Conv(dims[0], (4, 4), strides=(4, 4), dtype=self.dtype,
                    name="stem_conv")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="stem_norm")(x)
        for si, (depth, dim) in enumerate(zip(depths, dims)):
            if si > 0:
                x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                 name=f"down_{si}_norm")(x)
                x = nn.Conv(dim, (2, 2), strides=(2, 2), dtype=self.dtype,
                            name=f"down_{si}_conv")(x)
            for bi in range(depth):
                x = ConvNeXtBlock(dim, dtype=self.dtype,
                                  name=f"stage_{si}_block_{bi}")(x)
        x = x.mean(axis=(1, 2))
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="head_norm")(x)
        return nn.Dense(self.num_classes, dtype=self.dtype, name="head")(x)


class PerceptualLoss:
    """'lpips-convnext_s-w1-w2' combination (reference perceptual_loss.py:28).

    Callable ``(input01, target01) -> (B,) loss``; both towers frozen (params
    baked at construction, never trained).
    """

    def __init__(self, model_name: str = "lpips-convnext_s-1.0-0.1",
                 lpips_params=None, convnext_params=None, rng_seed: int = 0):
        self.use_lpips = "lpips" in model_name
        self.use_convnext = "convnext_s" in model_name
        self.w_lpips = self.w_convnext = None
        if self.use_lpips and self.use_convnext:
            parts = model_name.split("-")[-2:]
            self.w_lpips, self.w_convnext = float(parts[0]), float(parts[1])
        rng = jax.random.PRNGKey(rng_seed)
        dummy = jnp.zeros((1, 64, 64, 3))
        if self.use_lpips:
            self.lpips = LPIPS()
            self.lpips_params = lpips_params or self.lpips.init(rng, dummy, dummy)
            if lpips_params is None:
                warnings.warn(
                    "LPIPS running with random weights (no pretrained VGG in "
                    "this environment); loss values are not comparable to the "
                    "published setup."
                )
        if self.use_convnext:
            self.convnext = ConvNeXtS()
            self.convnext_params = convnext_params or self.convnext.init(
                jax.random.fold_in(rng, 1), jnp.zeros((1, 224, 224, 3))
            )
            if convnext_params is None:
                warnings.warn("ConvNeXt-S running with random weights.")

    def __call__(self, input01, target01):
        loss = 0.0
        denom = 0.0
        if self.use_lpips:
            l = self.lpips.apply(self.lpips_params, input01, target01)
            w = 1.0 if self.w_lpips is None else self.w_lpips
            loss = loss + w * l
            denom += w
        if self.use_convnext:
            size = 224
            resize = lambda img: jax.image.resize(
                img, (img.shape[0], size, size, img.shape[-1]), "bilinear"
            )
            norm = lambda img: (resize(img) - jnp.asarray(IMAGENET_MEAN)) / (
                jnp.asarray(IMAGENET_STD)
            )
            pi = self.convnext.apply(self.convnext_params, norm(input01))
            pt = self.convnext.apply(self.convnext_params, norm(target01))
            c = jnp.mean((pi - pt) ** 2)
            w = 1.0 if self.w_convnext is None else self.w_convnext
            loss = loss + w * c
            denom += w
        return loss / denom


# ---------------------------------------------------------------------------
# torch weight converters
# ---------------------------------------------------------------------------


def vgg16_params_from_torch(sd) -> dict:
    """torchvision vgg16 .features state dict + LPIPS lin weights -> params.

    ``sd`` keys: ``features.{i}.weight/bias`` (torchvision) and
    ``lin{k}.model.1.weight`` (LPIPS linear heads).
    """
    params: dict = {"vgg": {}}
    conv_idx = 0
    layer_idx = 0
    for v in VGG16_CFG:
        if v == "M":
            layer_idx += 1
            continue
        w = np.asarray(sd[f"features.{layer_idx}.weight"])  # (O, I, H, W)
        b = np.asarray(sd[f"features.{layer_idx}.bias"])
        params["vgg"][f"conv_{conv_idx}"] = {
            "kernel": w.transpose(2, 3, 1, 0),  # HWIO
            "bias": b,
        }
        conv_idx += 1
        layer_idx += 2  # conv + relu
    for i in range(5):
        lw = np.asarray(sd[f"lin{i}.model.1.weight"])  # (1, C, 1, 1)
        params[f"lin_{i}"] = {"kernel": lw.transpose(2, 3, 1, 0)}
    return {"params": params}


def convnext_s_params_from_torch(sd) -> dict:
    """torchvision convnext_small state dict -> ConvNeXtS params."""
    p: dict = {}
    g = lambda k: np.asarray(sd[k])
    p["stem_conv"] = {"kernel": g("features.0.0.weight").transpose(2, 3, 1, 0),
                      "bias": g("features.0.0.bias")}
    p["stem_norm"] = {"scale": g("features.0.1.weight"),
                      "bias": g("features.0.1.bias")}
    depths = (3, 3, 27, 3)
    for si in range(4):
        feat_idx = 1 + 2 * si
        if si > 0:
            down = f"features.{2 * si}"
            p[f"down_{si}_norm"] = {"scale": g(f"{down}.0.weight"),
                                    "bias": g(f"{down}.0.bias")}
            p[f"down_{si}_conv"] = {
                "kernel": g(f"{down}.1.weight").transpose(2, 3, 1, 0),
                "bias": g(f"{down}.1.bias"),
            }
        for bi in range(depths[si]):
            blk = f"features.{feat_idx}.{bi}.block"
            p[f"stage_{si}_block_{bi}"] = {
                "dwconv": {"kernel": g(f"{blk}.0.weight").transpose(2, 3, 1, 0),
                           "bias": g(f"{blk}.0.bias")},
                "norm": {"scale": g(f"{blk}.2.weight"),
                         "bias": g(f"{blk}.2.bias")},
                "pw1": {"kernel": g(f"{blk}.3.weight").T,
                        "bias": g(f"{blk}.3.bias")},
                "pw2": {"kernel": g(f"{blk}.5.weight").T,
                        "bias": g(f"{blk}.5.bias")},
                # torchvision stores layer_scale as (dim, 1, 1); the flax
                # gamma is (dim,) — without the reshape it mis-broadcasts
                "gamma": g(f"features.{feat_idx}.{bi}.layer_scale").reshape(-1),
            }
    p["head_norm"] = {"scale": g("classifier.0.weight"),
                      "bias": g("classifier.0.bias")}
    p["head"] = {"kernel": g("classifier.2.weight").T,
                 "bias": g("classifier.2.bias")}
    return {"params": p}
