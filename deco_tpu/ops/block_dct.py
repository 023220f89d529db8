"""8x8 block-DCT ops for the DeCo frequency-decoupled loss.

Re-implements the reference's torch block-DCT machinery
(``src/diffusion/flow_matching/training_repa_DeCo.py:95-195`` of hhhhzp/DeCo):
orthonormal 8x8 DCT-II matrix, RGB->YCbCr, blockwise DCT, and JPEG
quantization-table-derived per-frequency weights — as TPU-native XLA ops plus a
fused Pallas kernel for the frequency-weighted MSE.

TPU-first design notes:

- The separable 8x8 DCT is lifted to ONE 64x64 matmul per block via the
  Kronecker product ``D = C (x) C``: blocks are reshaped to ``(N, 64)`` and the
  whole transform is a single MXU-friendly GEMM, instead of two 8-wide
  contractions that can't tile the systolic array.
- The frequency loss exploits linearity: ``DCT(YCbCr(a)) - DCT(YCbCr(b)) =
  DCT(YCbCr(a - b))``, halving transform work versus the reference formulation
  (numerically identical).
- The Pallas kernel fuses YCbCr + blockify + DCT + weighting + reduction over
  row-strips so the pixel difference is read from HBM exactly once.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 8

# RGB -> YCbCr (JPEG convention), matching reference _rgb2ycbcr (:106-114).
RGB2YCBCR = np.array(
    [
        [0.299, 0.587, 0.114],
        [-0.168736, -0.331264, 0.5],
        [0.5, -0.418688, -0.081312],
    ],
    dtype=np.float32,
)


def dct_matrix(n: int = BLOCK) -> np.ndarray:
    """Orthonormal DCT-II matrix (reference _create_dct_matrix :95-104)."""
    i = np.arange(n, dtype=np.float64)
    k = np.arange(n, dtype=np.float64)[:, None]
    c = np.cos(math.pi * (2 * i + 1) * k / (2.0 * n))
    alpha = np.full(n, math.sqrt(2.0 / n))
    alpha[0] = math.sqrt(1.0 / n)
    return (alpha[:, None] * c).astype(np.float32)


@functools.lru_cache()
def dct_kron_matrix(n: int = BLOCK) -> np.ndarray:
    """64x64 Kronecker lift: vec(C X C^T) = (C (x) C) vec(X)."""
    c = dct_matrix(n).astype(np.float64)
    return np.kron(c, c).astype(np.float32)


def build_freq_weight(quality: int = 85, mode: str = "inv_gamma", gamma: float = 1.0) -> np.ndarray:
    """Per-frequency loss weights from JPEG quant tables.

    Parity with reference _build_freq_weight (:138-195). Returns an array of
    shape (3, 8, 8): channel order (Y, Cb, Cr).
    """
    lum_q = np.array(
        [
            [16, 11, 10, 16, 24, 40, 51, 61],
            [12, 12, 14, 19, 26, 58, 60, 55],
            [14, 13, 16, 24, 40, 57, 69, 56],
            [14, 17, 22, 29, 51, 87, 80, 62],
            [18, 22, 37, 56, 68, 109, 103, 77],
            [24, 35, 55, 64, 81, 104, 113, 92],
            [49, 64, 78, 87, 103, 121, 120, 101],
            [72, 92, 95, 98, 112, 100, 103, 99],
        ],
        dtype=np.float64,
    )
    chr_q = np.array(
        [
            [17, 18, 24, 47, 99, 99, 99, 99],
            [18, 21, 26, 66, 99, 99, 99, 99],
            [24, 26, 56, 99, 99, 99, 99, 99],
            [47, 66, 99, 99, 99, 99, 99, 99],
            [99, 99, 99, 99, 99, 99, 99, 99],
            [99, 99, 99, 99, 99, 99, 99, 99],
            [99, 99, 99, 99, 99, 99, 99, 99],
            [99, 99, 99, 99, 99, 99, 99, 99],
        ],
        dtype=np.float64,
    )

    def scale_q(base_q, quality):
        q = max(1, min(100, int(quality)))
        scale = 5000 / q if q < 50 else 200 - 2 * q
        return np.clip(np.floor((base_q * scale + 50) / 100), 1, 255)

    q_y = scale_q(lum_q, quality)
    q_c = scale_q(chr_q, quality)

    def q_to_weight(q):
        if mode == "inv":
            w = 1.0 / q
        elif mode == "inv_gamma":
            w = (q.mean() / q) ** gamma
        else:
            raise ValueError("mode must be 'inv' or 'inv_gamma'")
        return w / w.mean()

    w = np.stack([q_to_weight(q_y), q_to_weight(q_c), q_to_weight(q_c)], axis=0)
    return w.astype(np.float32)


def rgb_to_ycbcr(x):
    """RGB -> YCbCr over the trailing channel axis (NHWC)."""
    return jnp.einsum("...c,kc->...k", x, jnp.asarray(RGB2YCBCR))


def _blockify(x):
    """(B, H, W, C) -> (B, Bh, Bw, C, 64) with reflect padding to multiples of 8."""
    b, h, w, c = x.shape
    pad_h = (-h) % BLOCK
    pad_w = (-w) % BLOCK
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode="reflect")
    h2, w2 = h + pad_h, w + pad_w
    bh, bw = h2 // BLOCK, w2 // BLOCK
    x = x.reshape(b, bh, BLOCK, bw, BLOCK, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # (B, Bh, Bw, C, 8, 8)
    return x.reshape(b, bh, bw, c, BLOCK * BLOCK)


def block_dct_8x8(x):
    """Blockwise 8x8 DCT of an NHWC image; returns (B, Bh, Bw, C, 8, 8).

    Channel-last analog of the reference's (B, C, Bh, Bw, 8, 8) output.
    """
    blocks = _blockify(x.astype(jnp.float32))
    d = jnp.asarray(dct_kron_matrix())
    out = jnp.einsum("...k,fk->...f", blocks, d)
    b, bh, bw, c, _ = out.shape
    return out.reshape(b, bh, bw, c, BLOCK, BLOCK)


def block_idct_8x8(y):
    """Inverse of :func:`block_dct_8x8` (no unpadding; shapes must be 8-aligned)."""
    b, bh, bw, c, _, _ = y.shape
    d = jnp.asarray(dct_kron_matrix())
    flat = y.reshape(b, bh, bw, c, BLOCK * BLOCK)
    x = jnp.einsum("...f,fk->...k", flat, d)  # D^T = D^-1 (orthonormal)
    x = x.reshape(b, bh, bw, c, BLOCK, BLOCK)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, bh * BLOCK, bw * BLOCK, c)


def frequency_weighted_mse_xla(diff, freq_w):
    """mean(freq_w * DCT(YCbCr(diff))^2) — pure-XLA reference path.

    ``diff`` is NHWC (pred - target); ``freq_w`` is (3, 8, 8).
    """
    y = rgb_to_ycbcr(diff.astype(jnp.float32))
    f = block_dct_8x8(y)  # (B, Bh, Bw, C, 8, 8)
    w = jnp.asarray(freq_w)[None, None, None]
    return jnp.mean(w * f**2)


# ---------------------------------------------------------------------------
# Fused Pallas kernel
# ---------------------------------------------------------------------------


def _freq_mse_kernel(diff_ref, ycc_ref, cmat_ref, w_ref, acc_ref, *, n_blocks_w):
    """One program handles an 8-row strip of one image: (8, W, 3).

    Computes sum over the strip of freq_w * (C @ block @ C^T)^2 for each
    8x8 YCbCr block, accumulating a scalar partial sum.
    """
    strip = diff_ref[0].astype(jnp.float32)  # (8, W, 3)
    # YCbCr: (8, W, 3) x (3, 3)
    ycc = jax.lax.dot_general(
        strip,
        ycc_ref[...],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (8, W, 3)
    # -> (3, 8, W): channel-major so blocks are (8, 8) slices along W
    ycc = ycc.transpose(2, 0, 1)
    # row DCT: C @ X for all channels/cols at once: (8,8) @ (3, 8, W)
    c = cmat_ref[...]
    row_t = jax.lax.dot_general(
        ycc, c,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (3, W, 8) : [ch, w, u]
    # column DCT per 8-wide group along W: reshape (3, Bw, 8, 8) -> contract w-in-block
    g = row_t.reshape(3, n_blocks_w, BLOCK, BLOCK)  # [ch, bw, j, u]
    col_t = jax.lax.dot_general(
        g, c,
        dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (3, Bw, u, v)
    w = w_ref[...]  # (3, 8, 8) -> [ch, u, v]
    weighted = w[:, None] * col_t**2
    total = jnp.sum(weighted)

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        acc_ref[0, 0] = jnp.zeros((), jnp.float32)

    acc_ref[0, 0] += total


def frequency_weighted_mse_pallas(diff, freq_w, interpret: bool = False):
    """Fused Pallas path of :func:`frequency_weighted_mse_xla`.

    Requires H, W divisible by 8 (always true for the 256/512 px workloads; the
    XLA path handles ragged shapes with reflect padding). ``interpret=True``
    runs the kernel in Pallas interpret mode (CPU equivalence tests).
    """
    b, h, w, c = diff.shape
    assert c == 3 and h % BLOCK == 0 and w % BLOCK == 0
    n_strips = b * (h // BLOCK)
    x = diff.reshape(n_strips, BLOCK, w, c)
    # Strips wider than ~1k columns tile over W too: the kernel's channel-major
    # intermediates scale with the strip width and blow the ~16MB scoped VMEM
    # limit at 2048px (measured 17.56M > 16.00M during the 2048px train probe).
    wc = w
    while wc > 1024 and wc % 2 == 0 and (wc // 2) % BLOCK == 0:
        wc //= 2

    kernel = functools.partial(_freq_mse_kernel, n_blocks_w=wc // BLOCK)
    acc = pl.pallas_call(
        kernel,
        grid=(n_strips, w // wc),
        in_specs=[
            pl.BlockSpec((1, BLOCK, wc, c), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLOCK, BLOCK), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, BLOCK, BLOCK), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        interpret=interpret,
    )(
        x,
        jnp.asarray(RGB2YCBCR.T),
        jnp.asarray(dct_matrix()),
        jnp.asarray(freq_w, jnp.float32),
    )
    return acc[0, 0] / (b * h * w * c)


def _freq_mse_forward(diff, freq_w):
    """Dispatch: fused Pallas kernel on accelerators for 8-aligned shapes,
    pure XLA otherwise (CPU, ragged shapes). ``DECO_FREQ_MSE_IMPL`` in
    {pallas, xla} forces a path for perf A/B."""
    import os

    b, h, w, c = diff.shape
    aligned = c == 3 and h % BLOCK == 0 and w % BLOCK == 0
    forced = os.environ.get("DECO_FREQ_MSE_IMPL")
    if forced == "xla":
        use_pallas = False
    elif forced == "pallas":
        use_pallas = True
    else:
        use_pallas = aligned and jax.default_backend() != "cpu"
    if use_pallas:
        return frequency_weighted_mse_pallas(diff, freq_w)
    return frequency_weighted_mse_xla(diff, freq_w)


@jax.custom_vjp
def frequency_weighted_mse(diff, freq_w):
    """Frequency-weighted MSE with a hand-written VJP.

    Forward: mean(freq_w * DCT(YCbCr(diff))^2) — fused Pallas kernel on TPU
    (one HBM read of the pixel difference), XLA fallback elsewhere.
    Backward (orthonormal DCT): grad = (2/N) * Ycbcr^T(IDCT(freq_w * F)).
    """
    return _freq_mse_forward(diff, freq_w)


def _fwm_fwd(diff, freq_w):
    return _freq_mse_forward(diff, freq_w), (diff, freq_w)


def _fwm_bwd(res, g):
    diff, freq_w = res
    b, h, w, c = diff.shape
    y = rgb_to_ycbcr(diff.astype(jnp.float32))
    f = block_dct_8x8(y)
    wf = jnp.asarray(freq_w)[None, None, None] * f
    grad_y = block_idct_8x8(wf)[:, :h, :w, :]
    # pad gradient contributions are dropped (reflect-pad edge effects are
    # negligible for 8-aligned shapes, which is the only case we train on)
    grad_rgb = jnp.einsum("...k,kc->...c", grad_y, jnp.asarray(RGB2YCBCR))
    n = f.size
    return (g * 2.0 / n * grad_rgb).astype(diff.dtype), jnp.zeros_like(
        jnp.asarray(freq_w)
    )


frequency_weighted_mse.defvjp(_fwm_fwd, _fwm_bwd)
