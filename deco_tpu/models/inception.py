"""InceptionV3 pool3 feature extractor for in-framework FID (Flax).

Completes the metrics story (SURVEY §7: "FID via the ADM npz export path
first, jax-FID later"): :class:`InceptionV3Features` computes the standard
2048-d pool3 activations used by FID. Weights load from a pytorch-fid /
torchvision InceptionV3 state dict via :func:`inception_params_from_torch`
(zero-egress environment: architecture-complete, weights-gated like the other
frozen towers; the ADM npz export remains the canonical scoring path).

Architecture is the TF-ported FID tower by default (``fid_variant=True``:
padding-excluding branch avg pools, MAX branch pool in Mixed_7c, TF1-legacy
resize, (255x-128)/128 input scaling — what torchmetrics'
FrechetInceptionDistance actually scores with), with the plain torchvision
inception_v3 graph behind ``fid_variant=False``. Aux logits absent, NHWC.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class ConvBN(nn.Module):
    features: int
    kernel: Sequence[int]
    strides: Sequence[int] = (1, 1)
    padding: Any = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        x = nn.Conv(self.features, tuple(self.kernel), strides=tuple(self.strides),
                    padding=pad, use_bias=False, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


def _branch_avg_pool(x, fid_variant: bool):
    """3x3/1 avg pool; the FID-protocol tower (the TF port that torchmetrics'
    FrechetInceptionDistance scores with, compute_metrics.py:36) excludes the
    zero padding from the divisor (count_include_pad=False) — torchvision
    includes it."""
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                       count_include_pad=not fid_variant)


class InceptionA(nn.Module):
    pool_features: int
    dtype: Any = jnp.float32
    fid_variant: bool = False

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(64, (1, 1), dtype=self.dtype, name="branch1x1")(x)
        b5 = ConvBN(48, (1, 1), dtype=self.dtype, name="branch5x5_1")(x)
        b5 = ConvBN(64, (5, 5), padding=2, dtype=self.dtype, name="branch5x5_2")(b5)
        b3 = ConvBN(64, (1, 1), dtype=self.dtype, name="branch3x3dbl_1")(x)
        b3 = ConvBN(96, (3, 3), padding=1, dtype=self.dtype, name="branch3x3dbl_2")(b3)
        b3 = ConvBN(96, (3, 3), padding=1, dtype=self.dtype, name="branch3x3dbl_3")(b3)
        bp = _branch_avg_pool(x, self.fid_variant)
        bp = ConvBN(self.pool_features, (1, 1), dtype=self.dtype,
                    name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = ConvBN(384, (3, 3), strides=(2, 2), dtype=self.dtype,
                    name="branch3x3")(x)
        bd = ConvBN(64, (1, 1), dtype=self.dtype, name="branch3x3dbl_1")(x)
        bd = ConvBN(96, (3, 3), padding=1, dtype=self.dtype, name="branch3x3dbl_2")(bd)
        bd = ConvBN(96, (3, 3), strides=(2, 2), dtype=self.dtype,
                    name="branch3x3dbl_3")(bd)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    dtype: Any = jnp.float32
    fid_variant: bool = False

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = ConvBN(192, (1, 1), dtype=self.dtype, name="branch1x1")(x)
        b7 = ConvBN(c7, (1, 1), dtype=self.dtype, name="branch7x7_1")(x)
        b7 = ConvBN(c7, (1, 7), padding=((0, 0), (3, 3)), dtype=self.dtype,
                    name="branch7x7_2")(b7)
        b7 = ConvBN(192, (7, 1), padding=((3, 3), (0, 0)), dtype=self.dtype,
                    name="branch7x7_3")(b7)
        bd = ConvBN(c7, (1, 1), dtype=self.dtype, name="branch7x7dbl_1")(x)
        bd = ConvBN(c7, (7, 1), padding=((3, 3), (0, 0)), dtype=self.dtype,
                    name="branch7x7dbl_2")(bd)
        bd = ConvBN(c7, (1, 7), padding=((0, 0), (3, 3)), dtype=self.dtype,
                    name="branch7x7dbl_3")(bd)
        bd = ConvBN(c7, (7, 1), padding=((3, 3), (0, 0)), dtype=self.dtype,
                    name="branch7x7dbl_4")(bd)
        bd = ConvBN(192, (1, 7), padding=((0, 0), (3, 3)), dtype=self.dtype,
                    name="branch7x7dbl_5")(bd)
        bp = _branch_avg_pool(x, self.fid_variant)
        bp = ConvBN(192, (1, 1), dtype=self.dtype, name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = ConvBN(192, (1, 1), dtype=self.dtype, name="branch3x3_1")(x)
        b3 = ConvBN(320, (3, 3), strides=(2, 2), dtype=self.dtype,
                    name="branch3x3_2")(b3)
        b7 = ConvBN(192, (1, 1), dtype=self.dtype, name="branch7x7x3_1")(x)
        b7 = ConvBN(192, (1, 7), padding=((0, 0), (3, 3)), dtype=self.dtype,
                    name="branch7x7x3_2")(b7)
        b7 = ConvBN(192, (7, 1), padding=((3, 3), (0, 0)), dtype=self.dtype,
                    name="branch7x7x3_3")(b7)
        b7 = ConvBN(192, (3, 3), strides=(2, 2), dtype=self.dtype,
                    name="branch7x7x3_4")(b7)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    dtype: Any = jnp.float32
    fid_variant: bool = False
    # The LAST block of the TF-ported FID tower (Mixed_7c) pools its branch
    # with a MAX pool — a quirk of the original TF graph the torch ports
    # reproduce; torchvision uses avg everywhere.
    max_pool_branch: bool = False

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(320, (1, 1), dtype=self.dtype, name="branch1x1")(x)
        b3 = ConvBN(384, (1, 1), dtype=self.dtype, name="branch3x3_1")(x)
        b3a = ConvBN(384, (1, 3), padding=((0, 0), (1, 1)), dtype=self.dtype,
                     name="branch3x3_2a")(b3)
        b3b = ConvBN(384, (3, 1), padding=((1, 1), (0, 0)), dtype=self.dtype,
                     name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = ConvBN(448, (1, 1), dtype=self.dtype, name="branch3x3dbl_1")(x)
        bd = ConvBN(384, (3, 3), padding=1, dtype=self.dtype,
                    name="branch3x3dbl_2")(bd)
        bda = ConvBN(384, (1, 3), padding=((0, 0), (1, 1)), dtype=self.dtype,
                     name="branch3x3dbl_3a")(bd)
        bdb = ConvBN(384, (3, 1), padding=((1, 1), (0, 0)), dtype=self.dtype,
                     name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.max_pool_branch:
            bp = nn.max_pool(x, (3, 3), strides=(1, 1),
                             padding=((1, 1), (1, 1)))
        else:
            bp = _branch_avg_pool(x, self.fid_variant)
        bp = ConvBN(192, (1, 1), dtype=self.dtype, name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def tf1_bilinear_resize(x, out_h: int, out_w: int):
    """TF1-legacy bilinear resize (align_corners=False, NO half-pixel
    centers): source coord = i · in/out, the mapping the original TF FID
    graph and torch-fidelity's TF1x reimplementation use. Differs from
    jax.image.resize / torch F.interpolate, which are half-pixel. Separable:
    one 1-D lerp per spatial axis."""

    def lerp_axis(v, axis, out_size):
        in_size = v.shape[axis]
        scale = in_size / out_size
        coord = jnp.arange(out_size, dtype=jnp.float32) * scale
        lo = jnp.clip(jnp.floor(coord).astype(jnp.int32), 0, in_size - 1)
        hi = jnp.minimum(lo + 1, in_size - 1)
        frac = coord - lo.astype(jnp.float32)
        shape = [1] * v.ndim
        shape[axis] = out_size
        frac = frac.reshape(shape)
        a = jnp.take(v, lo, axis=axis)
        b = jnp.take(v, hi, axis=axis)
        return a + (b - a) * frac

    x = lerp_axis(x.astype(jnp.float32), 1, out_h)
    return lerp_axis(x, 2, out_w)


class InceptionV3Features(nn.Module):
    """Images in [0, 1] NHWC -> 2048-d pool3 FID features.

    ``fid_variant=True`` (default) is the FID-protocol tower — the TF-ported
    graph that torchmetrics' ``FrechetInceptionDistance``
    (``compute_metrics.py:36`` of the reference) and the ADM npz suite score
    with: TF1-legacy bilinear resize to 299, ``(255·x − 128)/128``
    normalization, padding-excluding branch avg pools, and a MAX branch pool
    in the last block; load the ``pt_inception-2015-12-05`` port through
    :func:`inception_params_from_torch` (same state-dict layout).
    ``fid_variant=False`` is plain torchvision ``inception_v3`` (half-pixel
    bilinear, ``2x−1``, avg everywhere) for torchvision google weights.
    """

    dtype: Any = jnp.float32
    fid_variant: bool = True
    # torchmetrics FrechetInceptionDistance(feature=...) taps: 64 = after the
    # first max pool, 192 = after the second, 768 = Mixed_6e, 2048 = final
    # pool3 (pytorch-fid BLOCK_INDEX_BY_DIM); each globally avg-pooled.
    feature_dim: int = 2048

    @nn.compact
    def __call__(self, x01):
        if self.feature_dim not in (64, 192, 768, 2048):
            raise ValueError(
                f"feature_dim {self.feature_dim} not a FID tap "
                "(choose 64, 192, 768 or 2048)")
        b = x01.shape[0]
        if self.fid_variant:
            x = tf1_bilinear_resize(x01, 299, 299)
            x = (x * 255.0 - 128.0) / 128.0
        else:
            # torchvision protocol: half-pixel bilinear (antialias=False to
            # match torch F.interpolate — matters when inputs are LARGER
            # than 299), then 2x-1.
            x = jax.image.resize(x01, (b, 299, 299, 3), "bilinear",
                                 antialias=False)
            x = x * 2.0 - 1.0
        fid = self.fid_variant
        x = ConvBN(32, (3, 3), strides=(2, 2), dtype=self.dtype,
                   name="Conv2d_1a_3x3")(x)
        x = ConvBN(32, (3, 3), dtype=self.dtype, name="Conv2d_2a_3x3")(x)
        x = ConvBN(64, (3, 3), padding=1, dtype=self.dtype,
                   name="Conv2d_2b_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        if self.feature_dim == 64:
            return x.mean(axis=(1, 2))
        x = ConvBN(80, (1, 1), dtype=self.dtype, name="Conv2d_3b_1x1")(x)
        x = ConvBN(192, (3, 3), dtype=self.dtype, name="Conv2d_4a_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        if self.feature_dim == 192:
            return x.mean(axis=(1, 2))
        x = InceptionA(32, dtype=self.dtype, fid_variant=fid, name="Mixed_5b")(x)
        x = InceptionA(64, dtype=self.dtype, fid_variant=fid, name="Mixed_5c")(x)
        x = InceptionA(64, dtype=self.dtype, fid_variant=fid, name="Mixed_5d")(x)
        x = InceptionB(dtype=self.dtype, name="Mixed_6a")(x)
        x = InceptionC(128, dtype=self.dtype, fid_variant=fid, name="Mixed_6b")(x)
        x = InceptionC(160, dtype=self.dtype, fid_variant=fid, name="Mixed_6c")(x)
        x = InceptionC(160, dtype=self.dtype, fid_variant=fid, name="Mixed_6d")(x)
        x = InceptionC(192, dtype=self.dtype, fid_variant=fid, name="Mixed_6e")(x)
        if self.feature_dim == 768:
            return x.mean(axis=(1, 2))
        x = InceptionD(dtype=self.dtype, name="Mixed_7a")(x)
        x = InceptionE(dtype=self.dtype, fid_variant=fid, name="Mixed_7b")(x)
        x = InceptionE(dtype=self.dtype, fid_variant=fid,
                       max_pool_branch=fid, name="Mixed_7c")(x)
        return x.mean(axis=(1, 2))  # (B, 2048)


def inception_params_from_torch(sd) -> dict:
    """torchvision inception_v3 state dict -> InceptionV3Features params.

    Returns a flax variables dict with 'params' and 'batch_stats'.
    """
    params: dict = {}
    stats: dict = {}

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = np.asarray(value)

    prefixes = set()
    for key in sd:
        if key.endswith("conv.weight"):
            prefixes.add(key[: -len(".conv.weight")])
    for pre in prefixes:
        path = pre.split(".")
        w = np.asarray(sd[pre + ".conv.weight"])  # OIHW
        put(params, path + ["conv", "kernel"], w.transpose(2, 3, 1, 0))
        put(params, path + ["bn", "scale"], sd[pre + ".bn.weight"])
        put(params, path + ["bn", "bias"], sd[pre + ".bn.bias"])
        put(stats, path + ["bn", "mean"], sd[pre + ".bn.running_mean"])
        put(stats, path + ["bn", "var"], sd[pre + ".bn.running_var"])
    return {"params": params, "batch_stats": stats}


def load_inception_variables(path: str):
    """Load tower weights: a torch state dict (.pt/.pth/.bin) converted via
    :func:`inception_params_from_torch`, or a flax msgpack snapshot."""
    if path.endswith((".pt", ".pth", ".bin")):
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
        return inception_params_from_torch(sd)
    from flax import serialization

    model = InceptionV3Features()
    template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def compute_fid_features(images01, variables, batch_size: int = 64):
    """Stream images through the tower -> (N, 2048) activations."""
    model = InceptionV3Features()
    apply = jax.jit(lambda v, x: model.apply(v, x))
    outs = []
    for i in range(0, len(images01), batch_size):
        outs.append(np.asarray(apply(variables, images01[i:i + batch_size])))
    return np.concatenate(outs, axis=0)
