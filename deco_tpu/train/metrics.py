"""Reconstruction/generation metrics: PSNR, SSIM, FID statistics.

TPU-native equivalent of the reference's three ComputeMetricsHook variants
(``src/callbacks/compute_metrics*.py``, SURVEY §2.12): metrics are pure jnp
functions; cross-host reduction is a psum/mean over the data axis instead of
torchmetrics' internal dist sync. FID follows the ADM protocol: activations ->
(mu, sigma) -> Frechet distance; the canonical path exports ``output.npz`` for
the external ADM suite (save_images.py:61-66) and :func:`frechet_distance`
scores precomputed stats locally.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def psnr(pred, target, data_range: float = 255.0):
    """Peak signal-to-noise ratio over NHWC batches (per-image mean).

    NOTE: this is the *per-image-mean* aggregation (the reference's
    ``compute_metrics_orig.py`` skimage variant). The production protocol —
    torchmetrics ``PeakSignalNoiseRatio(dim=None)`` in
    ``compute_metrics.py:27``, the variant every shipped config selects —
    pools ONE global MSE over the whole epoch and takes a single log at the
    end; use :func:`squared_error_stats` + :func:`psnr_from_stats` for that
    (what ``ComputeMetricsHook`` does). Mean-of-logs ≠ log-of-mean whenever
    per-image MSE varies.
    """
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    mse = jnp.mean((pred - target) ** 2, axis=(1, 2, 3))
    return jnp.mean(20 * jnp.log10(data_range) - 10 * jnp.log10(mse + 1e-12))


def squared_error_stats(pred, target):
    """(sum of squared error, element count) — the torchmetrics PSNR state.

    Matches ``PeakSignalNoiseRatio.update`` with ``dim=None``
    (``compute_metrics.py:27``): plain sums, so streaming/cross-host merges
    are exact additions. Accumulate in float64 on the host.
    """
    pred = jnp.asarray(pred, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    sse = jnp.sum((pred - target) ** 2)
    return float(np.float64(sse)), float(pred.size)


def psnr_from_stats(sse: float, n_obs: float, data_range: float = 255.0):
    """Global-MSE PSNR: ``10·log10(range²·n/sse)`` (torchmetrics compute).

    A bit-perfect reconstruction (sse == 0) returns ``inf``, exactly like
    torchmetrics ``PeakSignalNoiseRatio`` (log10(0) → -inf → PSNR +inf).
    """
    mse = sse / max(n_obs, 1.0)
    if mse == 0.0:
        return float("inf")
    return float(20 * np.log10(data_range) - 10 * np.log10(mse))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5):
    x = np.arange(size) - size // 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    g = g / g.sum()
    return jnp.asarray(np.outer(g, g), jnp.float32)


def ssim(pred, target, data_range: float = 255.0, kernel_size: int = 11,
         sigma: float = 1.5, per_image: bool = False):
    """Structural similarity (Gaussian-windowed, per-channel mean) over NHWC.

    Matches torchmetrics ``StructuralSimilarityIndexMeasure`` defaults
    (``compute_metrics.py:28``: gaussian 11/1.5, k1=.01, k2=.03): torchmetrics
    reflect-pads, convolves, then crops the pad back off, which is exactly a
    VALID-window map — averaged per image. ``per_image=True`` returns the
    (B,) per-image means (the torchmetrics accumulator state, summed then
    divided by total images at epoch end).
    """
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    k = _gaussian_kernel(kernel_size, sigma)[:, :, None, None]  # HWIO

    def filt(x):
        # depthwise conv: NHWC with feature_group_count=C
        c = x.shape[-1]
        kern = jnp.tile(k, (1, 1, 1, c))
        return jax.lax.conv_general_dilated(
            x, kern, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )

    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    mu_p, mu_t = filt(pred), filt(target)
    mu_p2, mu_t2, mu_pt = mu_p**2, mu_t**2, mu_p * mu_t
    sig_p = filt(pred**2) - mu_p2
    sig_t = filt(target**2) - mu_t2
    sig_pt = filt(pred * target) - mu_pt
    num = (2 * mu_pt + c1) * (2 * sig_pt + c2)
    den = (mu_p2 + mu_t2 + c1) * (sig_p + sig_t + c2)
    if per_image:
        return jnp.mean(num / den, axis=(1, 2, 3))
    return jnp.mean(num / den)


class FIDStats:
    """Streaming (mu, sigma) accumulator for Frechet distance.

    Feed activation batches (N, D); finalize to (mu, cov). Cross-host: sum the
    raw moments with process_allgather/psum before finalize.
    """

    def __init__(self, dim: int):
        self.n = 0
        self.s1 = np.zeros((dim,), np.float64)
        self.s2 = np.zeros((dim, dim), np.float64)

    def update(self, acts: np.ndarray):
        acts = np.asarray(acts, np.float64)
        self.n += acts.shape[0]
        self.s1 += acts.sum(0)
        self.s2 += acts.T @ acts

    def merge(self, other: "FIDStats"):
        self.n += other.n
        self.s1 += other.s1
        self.s2 += other.s2

    def finalize(self):
        mu = self.s1 / self.n
        cov = self.s2 / (self.n - 1) - np.outer(mu, mu) * self.n / (self.n - 1)
        return mu, cov


def frechet_distance(mu1, cov1, mu2, cov2, eps: float = 1e-6):
    """FID between two Gaussians (scipy-free sqrtm via eigendecomposition)."""
    mu1, mu2 = np.asarray(mu1), np.asarray(mu2)
    cov1, cov2 = np.asarray(cov1), np.asarray(cov2)
    diff = mu1 - mu2
    # sqrtm(cov1 @ cov2) via symmetric form: sqrtm(A) with
    # A = sqrt(cov1) cov2 sqrt(cov1)
    vals1, vecs1 = np.linalg.eigh(cov1)
    vals1 = np.clip(vals1, 0, None)
    sqrt1 = (vecs1 * np.sqrt(vals1)) @ vecs1.T
    inner = sqrt1 @ cov2 @ sqrt1
    vals, _ = np.linalg.eigh((inner + inner.T) / 2)
    tr_sqrt = np.sqrt(np.clip(vals, 0, None)).sum()
    return float(diff @ diff + np.trace(cov1) + np.trace(cov2) - 2 * tr_sqrt)


def fid_from_images(images01_a, images01_b, inception_variables=None,
                    batch_size: int = 64) -> float:
    """In-framework FID between two image sets ([0,1] NHWC uint8/float).

    Uses the Flax InceptionV3 pool3 tower (weights-gated — see
    deco_tpu.models.inception); the ADM npz export remains the canonical
    protocol for published-number comparisons.
    """
    import jax

    from deco_tpu.models.inception import (
        InceptionV3Features,
        compute_fid_features,
    )

    if inception_variables is None:
        import warnings

        warnings.warn(
            "FID with a randomly initialized Inception tower — values are "
            "self-consistent but not comparable to published FIDs."
        )
        model = InceptionV3Features()
        inception_variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
        )
    feats = []
    for imgs in (images01_a, images01_b):
        arr = np.asarray(imgs, np.float32)
        if arr.max() > 1.5:  # uint8 range
            arr = arr / 255.0
        feats.append(compute_fid_features(arr, inception_variables, batch_size))
    stats = []
    for f in feats:
        s = FIDStats(f.shape[1])
        s.update(f)
        stats.append(s.finalize())
    return frechet_distance(*stats[0], *stats[1])
