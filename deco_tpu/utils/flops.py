"""Analytic FLOPs accounting + MFU for the DeCo workloads.

BASELINE.json's bar is "speed-of-light images/sec/chip" — this module turns a
measured img/s into a model-FLOPs-utilization number against the chip's peak
so "fast" is checkable (VERDICT r1 weak #5). Counts matmul FLOPs only
(2*M*N*K per GEMM); elementwise/softmax/norm work is bandwidth- not
FLOPs-bound and conventionally excluded from MFU.

Preferred source is XLA's own cost model (``compiled.cost_analysis()``);
:func:`deco_c2i_flops` is the closed-form cross-check and fallback.
"""

from __future__ import annotations

# bf16 dense peak per chip.
PEAK_FLOPS = {
    "v5e": 197e12,   # TPU v5e (v5litepod): 197 TF/s bf16
    "v5p": 459e12,
    "v4": 275e12,
    "v6e": 918e12,
    "cpu": 1e12,     # nominal, keeps the formula total on CPU smoke runs
}


def dit_block_flops(tokens: int, hidden: int, mlp_hidden: int,
                    kv_tokens: int | None = None) -> float:
    """Matmul FLOPs for one adaLN DiT block forward, per batch element.

    qkv + attention (scores & pv vs ``kv_tokens``) + out-proj + SwiGLU
    (w1/w3/w2) + the adaLN modulation Linear(h -> 6h).
    """
    kv = kv_tokens if kv_tokens is not None else tokens
    qkv = 2 * tokens * hidden * 3 * hidden
    attn = 2 * 2 * tokens * kv * hidden  # QK^T and PV
    proj = 2 * tokens * hidden * hidden
    swiglu = 3 * 2 * tokens * hidden * mlp_hidden
    # adaLN modulation input is the per-SAMPLE (t+y) vector, not per-token
    adaln = 2 * hidden * 6 * hidden
    return float(qkv + attn + proj + swiglu + adaln)


def deco_pixel_decoder_flops(num_patches: int, patch: int, width: int,
                             hidden: int, num_res_blocks: int,
                             out_channels: int = 3) -> float:
    """SimpleMLPAdaLN per-patch pixel decoder, per batch element.

    Per patch: cond_embed z(hidden) -> p^2 * width, NerfEmbedder input proj
    (64 DCT basis -> width), ``num_res_blocks`` ResBlocks at per-pixel width
    (two width x width Dense + adaLN width -> 3*width), zero-init out proj.
    """
    px = patch * patch
    in_proj = 2 * px * 64 * width  # NerfEmbedder DCT basis (64) -> width
    cond = 2 * hidden * px * width  # cond_embed: z -> P^2 per-pixel conds
    # per ResBlock per pixel: adaLN Dense(w -> 3w) + two Dense(w -> w)
    res = num_res_blocks * px * (2 * width * 3 * width + 2 * 2 * width * width)
    out = 2 * px * width * out_channels
    return float(num_patches * (in_proj + cond + res + out))


def deco_c2i_flops(image_size: int = 256, patch: int = 16,
                   hidden: int = 1152, num_cond_blocks: int = 28,
                   num_blocks: int = 31, hidden_x: int = 32) -> float:
    """Forward matmul FLOPs for one DeCo c2i image (one net call).

    DeCo-XL/16 at 256px: 28 DiT blocks over 256 tokens + a 3-ResBlock
    per-patch pixel decoder at width 32 (reference dit_c2i_DeCo.py:417-536).
    """
    tokens = (image_size // patch) ** 2
    mlp_hidden = int(2 / 3 * 4 * hidden)
    trunk = num_cond_blocks * dit_block_flops(tokens, hidden, mlp_hidden)
    dec = deco_pixel_decoder_flops(
        tokens, patch, hidden_x, hidden, num_blocks - num_cond_blocks
    )
    # patch embed in/out
    embed = 2 * tokens * (patch * patch * 3) * hidden
    return trunk + dec + embed


def sampler_flops_per_image(net_flops: float, num_steps: int,
                            cfg_batch_factor: float = 2.0) -> float:
    """Total FLOPs per generated image for an N-step CFG sampler.

    ``cfg_batch_factor`` 2.0 = classic [uncond, cond] double batch; the
    uncond-skip optimization makes it (2*k + (N-k))/N for k guided steps.
    """
    return net_flops * num_steps * cfg_batch_factor


def mfu(img_per_sec_per_chip: float, flops_per_image: float,
        chip: str = "v5e") -> float:
    return img_per_sec_per_chip * flops_per_image / PEAK_FLOPS[chip]
