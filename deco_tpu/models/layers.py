"""Shared Flax layers for the DeCo model family.

Functional parity with the reference layer set (hhhhzp/DeCo
``src/models/layers/*`` and the copies embedded in
``src/models/transformer/dit_c2i_DeCo.py``), re-designed for TPU:

- NHWC / (B, L, D) layouts throughout; patchify is a reshape+transpose.
- RoPE uses a real cos/sin formulation (precomputed fp32 tables) instead of
  torch complex numbers — numerically identical rotation of (even, odd) pairs.
- RMSNorm computes in fp32 and casts back, mirroring the reference's explicit
  upcast (``src/models/layers/rmsnorm.py:5-18``).
- The dtype policy is params fp32 / compute bf16, matching the reference's
  bf16-autocast-with-fp32-islands behavior.
"""

from __future__ import annotations

import math
import os
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name as _checkpoint_name

from deco_tpu.ops import quant as quant_ops

Dtype = Any

# nn.Dense's default kernel init — reused by the fused/quantized Dense
# variants below so init-from-seed and checkpoint layout are identical
# whichever path a module takes.
_DENSE_KERNEL_INIT = nn.initializers.lecun_normal()


class ParamKernel(nn.Module):
    """A bare ``kernel`` parameter living at the same path as nn.Dense's.

    Lets a parent module own several Dense-shaped kernels (``w1/kernel``,
    ``w3/kernel``, ...) while computing a fused matmul over their
    concatenation — the checkpoint tree is indistinguishable from separate
    nn.Dense submodules.
    """

    features: int

    @nn.compact
    def __call__(self, in_dim: int):
        return self.param(
            "kernel", _DENSE_KERNEL_INIT, (in_dim, self.features), jnp.float32
        )


class Int8Dense(nn.Module):
    """Drop-in nn.Dense running the W8A8 int8 MXU path (ops/quant.py).

    Identical parameter tree (``kernel`` / optional ``bias``, fp32) so a
    checkpoint trained on the exact path loads unchanged; only the matmul
    numerics differ (symmetric per-token activation / per-channel weight
    scales, int32 accumulation). Inference-only.

    Weight quantization is cached in the ``quant`` variable collection:
    ``model.apply(vars, ..., mutable="quant")`` once populates it (one pass
    over the params), then passing the collection to subsequent applies makes
    every step reuse the int8 kernels — quantizing inside a 50-step sampler
    scan would re-read all trunk weights every step (measured: erases the MXU
    win). Without the collection the weight is quantized on the fly.
    """

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", _DENSE_KERNEL_INIT, (x.shape[-1], self.features), jnp.float32
        )
        wq, ws = _cached_weight_quant(self, "kernel_q", kernel)
        y = quant_ops.int8_matmul_prequant(x, wq, ws).astype(self.dtype)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros_init(), (self.features,), jnp.float32
            )
            y = y + bias.astype(self.dtype)
        return y


def _kernel_fingerprint(kernel):
    """Cheap source-weight fingerprint: (sum, l1, sum-of-squares) over the
    kernel's last two axes.

    Stored alongside the cached int8 weights so verify_quant_cache can detect
    a cache that was populated from DIFFERENT params than the ones now in use
    (e.g. random-init cache carried past a checkpoint restore — serving that
    silently produces garbage). Reduces the last two axes so it works both on
    a module-level (K, N) kernel and on the (L, K, N) nn.scan-stacked layout.
    Sensitivity: any O(1)-dim statistic shifts only ~|Δw|·√N under a tiny
    param delta, so a cache a step or two stale can pass — harmless (the
    int8 rounding error dominates); genuinely different weight sets (the
    advisor's restore scenario) shift all three components at O(1) relative.
    """
    kf = kernel.astype(jnp.float32)
    return jnp.stack(
        [jnp.sum(kf, axis=(-2, -1)),
         jnp.sum(jnp.abs(kf), axis=(-2, -1)),
         jnp.sum(kf * kf, axis=(-2, -1))],
        axis=-1,
    )


def _cached_weight_quant(mod: nn.Module, name: str, kernel):
    """(int8, scale) for ``kernel``, cached in the ``quant`` collection.

    The cached value is (int8 weights, scales, source fingerprint); the
    fingerprint never enters the matmul — it exists so load paths can verify
    the cache matches the live params (see verify_quant_cache). The cache is
    only trustworthy when populated from the params being applied: every
    param-load path must re-run one ``mutable='quant'`` apply
    (ops/quant.refresh_quant_cache) before serving from the cache.
    """
    if mod.is_mutable_collection("quant") or mod.has_variable("quant", name):
        q, s, _fp = mod.variable(
            "quant", name,
            lambda: (*quant_ops.quantize_weight(kernel),
                     _kernel_fingerprint(kernel)),
        ).value
        return q, s
    return quant_ops.quantize_weight(kernel)


class StaleQuantCacheError(ValueError):
    """The int8 weight cache was built from different params than supplied."""


def verify_quant_cache(variables, *, rtol: float = 1e-5) -> None:
    """Raise StaleQuantCacheError if ``variables['quant']`` does not match
    ``variables['params']``.

    Walks the quant collection (which mirrors the module tree) and compares
    each cached fingerprint against one recomputed from the live kernels.
    Cheap (one pass over the weights, outside any jit) — run it once at
    pipeline construction; per-dispatch checking would re-read all trunk
    weights every sampler step, which is exactly what the cache avoids.
    """
    import numpy as np

    quant = variables.get("quant") if hasattr(variables, "get") else None
    if quant is None:
        return
    params = variables["params"]
    bad: list = []

    def fp_of(p, leaf_name):
        if leaf_name == "kernel_q":
            return _kernel_fingerprint(p["kernel"])
        if leaf_name == "w2_q":
            return _kernel_fingerprint(p["w2"]["kernel"])
        if leaf_name == "w13_q":
            # cached from concat(w1, w3) along the output axis: both the sum
            # and the l1 of the concat are the elementwise sums of the parts
            return (_kernel_fingerprint(p["w1"]["kernel"])
                    + _kernel_fingerprint(p["w3"]["kernel"]))
        return None

    def walk(q, p, path):
        for k, v in q.items():
            if hasattr(v, "items"):  # submodule dict
                walk(v, p[k], path + (k,))
                continue
            if not (isinstance(v, (tuple, list)) and len(v) == 3):
                bad.append(("/".join(path + (k,)), "no fingerprint "
                            "(cache predates verification — refresh it)"))
                continue
            live = fp_of(p, k)
            if live is None:
                bad.append(("/".join(path + (k,)), "unknown cache entry"))
                continue
            cached = np.asarray(v[2], np.float64)
            livef = np.asarray(live, np.float64)
            scale = np.maximum(np.abs(livef), 1.0)
            if not np.all(np.abs(cached - livef) <= rtol * scale):
                bad.append(("/".join(path + (k,)), "fingerprint mismatch"))

    walk(quant, params, ())
    if bad:
        detail = "; ".join(f"{p}: {why}" for p, why in bad[:8])
        raise StaleQuantCacheError(
            f"int8 quant cache does not match the supplied params "
            f"({len(bad)} entries — {detail}). The cache was populated from "
            "different weights (e.g. random init before a checkpoint "
            "restore); serving it produces garbage. Rebuild it from the "
            "loaded params with ops/quant.refresh_quant_cache."
        )


def modulate(x, shift, scale):
    """adaLN modulation: x * (1 + scale) + shift."""
    return x * (1 + scale) + shift


class RMSNorm(nn.Module):
    """RMSNorm with fp32 internal compute (reference rmsnorm.py:5-18)."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        input_dtype = x.dtype
        weight = self.param("weight", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        xf = x.astype(jnp.float32)
        variance = jnp.mean(xf**2, axis=-1, keepdims=True)
        xf = xf * jax.lax.rsqrt(variance + self.eps)
        return (weight * xf).astype(input_dtype)


class SwiGLU(nn.Module):
    """SwiGLU feed-forward.

    Two reference variants share this module:
    - c2i DeCo blocks (dit_c2i_DeCo.py:101-114): callers pass
      ``hidden_dim = mlp_ratio * dim`` and the effective width is
      ``2*hidden/3`` (``exact_hidden=False``);
    - the fused-w12 ``src/models/layers/swiglu.py`` used by t2i/uniflow/ReCo:
      the width is ``hidden_dim`` exactly (``exact_hidden=True``). The fused
      layout maps onto the separate (w1, w3) kernels at conversion time.
    """

    hidden_dim: int
    exact_hidden: bool = False
    dtype: Dtype = jnp.bfloat16
    quantize: bool = False  # W8A8 int8 trunk mode (ops/quant.py); implies fused

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        hidden = self.hidden_dim if self.exact_hidden else int(
            2 * self.hidden_dim / 3
        )
        # Fused w13: one (dim -> 2*hidden) GEMM over concat(w1, w3) kernels.
        # Wider outputs run the MXU markedly better at trunk shapes (measured
        # on v5e: 1152x3456 GEMM ~71-103 TFLOP/s vs 2048x8192 ~135); the
        # concat of loop-invariant kernels is hoisted out of sampler scans.
        # Same math (each output column's reduction is unchanged), but not
        # guaranteed bit-identical tiling — so opt-in via DECO_SWIGLU_FUSED=1,
        # and always on under int8 (one activation quantization feeds both).
        fused = self.quantize or os.environ.get("DECO_SWIGLU_FUSED") == "1"
        if not fused:
            w1 = nn.Dense(hidden, use_bias=False, dtype=self.dtype, name="w1")
            w3 = nn.Dense(hidden, use_bias=False, dtype=self.dtype, name="w3")
            w2 = nn.Dense(dim, use_bias=False, dtype=self.dtype, name="w2")
            return w2(nn.silu(w1(x)) * w3(x))
        w1k = ParamKernel(hidden, name="w1")(dim)
        w3k = ParamKernel(hidden, name="w3")(dim)
        w2k = ParamKernel(dim, name="w2")(hidden)
        w13 = jnp.concatenate([w1k, w3k], axis=1)
        if self.quantize:
            wq, ws = _cached_weight_quant(self, "w13_q", w13)
            h = quant_ops.int8_matmul_prequant(x, wq, ws).astype(self.dtype)
            h1, h3 = h[..., :hidden], h[..., hidden:]
            w2q, w2s = _cached_weight_quant(self, "w2_q", w2k)
            return quant_ops.int8_matmul_prequant(
                nn.silu(h1) * h3, w2q, w2s
            ).astype(self.dtype)
        h = jnp.dot(x.astype(self.dtype), w13.astype(self.dtype))
        h1, h3 = h[..., :hidden], h[..., hidden:]
        return jnp.dot(
            (nn.silu(h1) * h3).astype(self.dtype), w2k.astype(self.dtype)
        )


class TimestepEmbedder(nn.Module):
    """Sinusoidal timestep embedding + 2-layer MLP.

    NOTE: ``max_period`` defaults to 10 — the reference's deliberate quirk for
    the DeCo family (``src/models/layers/time_embed.py:16``; flow-matching t is
    in [0,1], so the usual 10000 wastes nearly the whole frequency range). The
    UniFlow family overrides this with 10000.
    """

    hidden_size: int
    frequency_embedding_size: int = 256
    max_period: float = 10.0
    dtype: Dtype = jnp.bfloat16

    def timestep_embedding(self, t, dim):
        half = dim // 2
        freqs = jnp.exp(
            -math.log(self.max_period)
            * jnp.arange(half, dtype=jnp.float32)
            / half
        )
        args = t[..., None].astype(jnp.float32) * freqs[None]
        embedding = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
        if dim % 2:
            embedding = jnp.concatenate(
                [embedding, jnp.zeros_like(embedding[..., :1])], axis=-1
            )
        return embedding

    @nn.compact
    def __call__(self, t):
        t_freq = self.timestep_embedding(t, self.frequency_embedding_size)
        t_freq = t_freq.astype(self.dtype)
        h = nn.Dense(
            self.hidden_size,
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(stddev=0.02),
            name="mlp_0",
        )(t_freq)
        h = nn.silu(h)
        return nn.Dense(
            self.hidden_size,
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(stddev=0.02),
            name="mlp_2",
        )(h)


class Embed(nn.Module):
    """Linear patch/feature embed with optional norm (reference patch_embed.py:6-22)."""

    embed_dim: int
    use_norm: bool = False
    use_bias: bool = True
    dtype: Dtype = jnp.bfloat16
    kernel_init: Callable = nn.initializers.xavier_uniform()

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(
            self.embed_dim,
            use_bias=self.use_bias,
            dtype=self.dtype,
            kernel_init=self.kernel_init,
            name="proj",
        )(x)
        if self.use_norm:
            x = RMSNorm(name="norm")(x)
        return x


class LabelEmbedder(nn.Module):
    """Class-label embedding table (reference dit_c2i_DeCo.py:60-69)."""

    num_classes: int
    hidden_size: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, labels):
        table = self.param(
            "embedding",
            nn.initializers.normal(stddev=0.02),
            (self.num_classes, self.hidden_size),
            jnp.float32,
        )
        return jnp.take(table, labels, axis=0).astype(self.dtype)


class FinalLayer(nn.Module):
    """adaLN final layer with zero-init linear (reference final_layer.py:6-19)."""

    out_channels: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, c):
        hidden = x.shape[-1]
        mod = nn.Dense(
            2 * hidden,
            dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            name="adaLN_modulation",
        )(c)
        shift, scale = jnp.split(mod, 2, axis=-1)
        x = nn.LayerNorm(
            epsilon=1e-6, use_bias=False, use_scale=False, dtype=self.dtype,
            name="norm_final",
        )(x)
        x = modulate(x, shift, scale)
        return nn.Dense(
            self.out_channels,
            dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="linear",
        )(x)


# ---------------------------------------------------------------------------
# 2-D RoPE (cos/sin formulation of the reference's complex implementation)
# ---------------------------------------------------------------------------


def precompute_rope_2d(
    dim: int, height: int, width: int, theta: float = 10000.0, scale=16.0,
    extrapolate: bool = False,
):
    """Axial 2-D RoPE tables.

    Returns (cos, sin) float32 arrays of shape (N, dim/2) where N = height*width
    and angle columns interleave x/y frequencies: [x_f0, y_f0, x_f1, y_f1, ...].
    Equivalent to the reference's complex ``precompute_freqs_cis_2d``
    (``src/models/layers/rope.py:5-28``); ``extrapolate=True`` gives the
    resolution-scaled ``precompute_freqs_cis_ex2d`` variant (:30-46) where
    positions span [0, H*scale_h] x [0, W*scale_w] enabling arbitrary
    resolutions at inference.
    """
    if extrapolate:
        if isinstance(scale, (int, float)):
            scale = (float(scale), float(scale))
        x_pos = np.linspace(0, height * scale[0], width)
        y_pos = np.linspace(0, width * scale[1], height)
    else:
        x_pos = np.linspace(0, scale, width)
        y_pos = np.linspace(0, scale, height)
    y_grid, x_grid = np.meshgrid(y_pos, x_pos, indexing="ij")
    y_flat, x_flat = y_grid.reshape(-1), x_grid.reshape(-1)
    freqs = 1.0 / (theta ** (np.arange(0, dim, 4)[: dim // 4] / dim))
    x_angles = np.outer(x_flat, freqs)  # (N, dim/4)
    y_angles = np.outer(y_flat, freqs)
    # interleave [x, y] per frequency -> (N, dim/2)
    angles = np.stack([x_angles, y_angles], axis=-1).reshape(len(x_flat), -1)
    return (
        jnp.asarray(np.cos(angles), jnp.float32),
        jnp.asarray(np.sin(angles), jnp.float32),
    )


def apply_rope(xq, xk, rope):
    """Rotate (even, odd) channel pairs of q/k by the precomputed table.

    xq/xk: (B, N, H, Hc); rope: (cos, sin) each (N, Hc/2).

    Precision note (deliberate TPU deviation): the rotation runs in the
    INPUT dtype. The reference upcasts to complex64 (rope.py:49-60); on TPU
    the fp32 round-trip through the lane-interleaved layout costs ~12% of the
    whole 50-step sampler (measured), while bf16 rotation changes q/k by
    ~1e-3 relative — far below the bf16 matmul noise floor that follows.
    Models running in fp32 (all golden parity tests) still get exact fp32
    rotation through this path.
    """
    cos, sin = rope
    dtype = xq.dtype
    cos = cos.astype(dtype)[None, :, None, :]
    sin = sin.astype(dtype)[None, :, None, :]

    def rot(x):
        even = x[..., 0::2]
        odd = x[..., 1::2]
        out_even = even * cos - odd * sin
        out_odd = even * sin + odd * cos
        return jnp.stack([out_even, out_odd], axis=-1).reshape(x.shape)

    return rot(xq), rot(xk)


# ---------------------------------------------------------------------------
# Attention
# ---------------------------------------------------------------------------


def sdpa(q, k, v, mask=None, dtype=jnp.bfloat16, impl: str = "auto",
         extra_kv=None):
    """Scaled dot-product attention. q/k/v: (B, N, H, Hc), head axis dim 2.

    ``impl``:
    - "auto": the Pallas flash kernel for unmasked attention on accelerators
      (logits never round-trip HBM — measured +12% END-TO-END on the DeCo-XL
      50-step sampler at 256 tokens vs XLA's fused attention, and 2x
      standalone at 1024 tokens); XLA fused attention for masked/CPU cases.
    - "xla": ``jax.nn.dot_product_attention``.
    - "einsum": explicit fp32-softmax reference path (used by parity tests).
    - "flash": force the Pallas kernel.
    - "ring": context-parallel ring attention over the mesh ``model`` axis —
      ONLY valid inside a ``shard_map`` that binds that axis with the
      sequence sharded over it (``parallel/sp_trunk.py``); unmasked only.

    ``extra_kv``: optional (k2, v2) of EXTRA tokens every query attends to
    beyond k/v — the t2i joint-attention case (text KV next to image KV).
    Dense impls concatenate them onto the key axis; "ring" keeps them
    REPLICATED per device (they seed the (o, lse) accumulator) while k/v
    ride the ring sequence-sharded.
    """
    head_dim = q.shape[-1]
    scale = 1.0 / math.sqrt(head_dim)
    if impl == "ring":
        assert mask is None, "ring attention is unmasked-only"
        from deco_tpu.parallel.mesh import MODEL_AXIS
        from deco_tpu.parallel.ring_attention import ring_attention_local

        return ring_attention_local(
            q, k, v, axis=MODEL_AXIS,
            axis_size=jax.lax.axis_size(MODEL_AXIS), scale=scale,
            extra_kv=extra_kv,
        )
    if extra_kv is not None:
        k = jnp.concatenate([k, extra_kv[0]], axis=1)
        v = jnp.concatenate([v, extra_kv[1]], axis=1)
    if impl == "auto":
        import os

        forced = os.environ.get("DECO_ATTN_IMPL")  # perf A/B override
        on_accel = jax.default_backend() != "cpu"
        if forced:
            impl = forced
        elif mask is None and on_accel:
            impl = "flash"
        else:
            impl = "xla"
    if impl == "flash":
        from deco_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, scale=scale)
    if impl == "xla":
        if mask is not None and mask.dtype != jnp.bool_:
            mask = mask.astype(jnp.bool_)
        out = jax.nn.dot_product_attention(q, k, v, mask=mask, scale=scale)
        # tag for the selective "attn" remat policy (flash path tags inside
        # its custom_vjp fwd, where the lse residual also gets a name)
        return _checkpoint_name(out, "attn_out")
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    logits = logits * scale
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1).astype(dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


class RAttention(nn.Module):
    """RoPE + qk-RMSNorm multi-head self-attention (reference dit_c2i_DeCo.py:148-190)."""

    num_heads: int
    qkv_bias: bool = False
    dtype: Dtype = jnp.bfloat16
    attn_impl: str = "auto"  # forwarded to sdpa ("ring" = context parallel)
    quantize: bool = False  # int8 qkv/proj GEMMs (attention math stays bf16)

    @nn.compact
    def __call__(self, x, rope, mask=None):
        b, n, c = x.shape
        head_dim = c // self.num_heads
        dense = Int8Dense if self.quantize else nn.Dense
        qkv = dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)
        # Layout note: a head-major variant (transpose to (3,B,H,N,D) off the
        # qkv GEMM so the flash fold is a free reshape) measured NO in-context
        # win over this token-major layout (4.773 vs 4.768 img/s on the
        # round-5 headline, scripts/bench_headmajor_ab.py) — XLA already
        # fuses/overlaps the fold transposes; the kernel's real costs were
        # the 72->128 HBM pad and one-plane grid granularity, both fixed in
        # ops/flash_attention (grouped unpadded kernel, +6% end-to-end).
        qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q = RMSNorm(name="q_norm")(q)
        k = RMSNorm(name="k_norm")(k)
        q, k = apply_rope(q, k, rope)
        out = sdpa(q, k, v, mask=mask, dtype=self.dtype, impl=self.attn_impl)
        out = out.reshape(b, n, c)
        return dense(c, dtype=self.dtype, name="proj")(out)


class JointAttention(nn.Module):
    """Image-query attention over concat(image kv, text kv); RoPE on image only.

    Reference ``src/models/transformer/dit_t2i_pixnerd.py:16-63`` — the t2i
    encoder block's attention: q from image tokens, k/v from both image tokens
    (RoPE'd) and text tokens (no RoPE), with shared k-RMSNorm.

    ``attn_impl="ring"``: context-parallel — only valid inside a shard_map
    binding the ``model`` axis with IMAGE tokens sequence-sharded over it and
    text tokens replicated (``parallel/sp_trunk.sequence_parallel_joint_trunk``).
    Image KV rides the ring; text KV seeds the (o, lse) accumulator on every
    device.
    """

    num_heads: int
    qkv_bias: bool = False
    dtype: Dtype = jnp.bfloat16
    attn_impl: str = "auto"
    quantize: bool = False  # int8 qkv/kv/proj GEMMs

    @nn.compact
    def __call__(self, x, y, rope):
        b, n, c = x.shape
        head_dim = c // self.num_heads
        dense = Int8Dense if self.quantize else nn.Dense
        qkv_x = dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv_x")(x)
        qkv_x = qkv_x.reshape(b, n, 3, self.num_heads, head_dim)
        q, kx, vx = qkv_x[:, :, 0], qkv_x[:, :, 1], qkv_x[:, :, 2]
        q_norm = RMSNorm(name="q_norm")
        k_norm = RMSNorm(name="k_norm")
        q = q_norm(q)
        kx = k_norm(kx)
        q, kx = apply_rope(q, kx, rope)

        m = y.shape[1]
        kv_y = dense(2 * c, use_bias=self.qkv_bias, dtype=self.dtype, name="kv_y")(y)
        kv_y = kv_y.reshape(b, m, 2, self.num_heads, head_dim)
        ky, vy = kv_y[:, :, 0], kv_y[:, :, 1]
        ky = k_norm(ky)

        out = sdpa(q, kx, vx, dtype=self.dtype, impl=self.attn_impl,
                   extra_kv=(ky, vy))
        out = out.reshape(b, n, c)
        return dense(c, dtype=self.dtype, name="proj")(out)


class FlattenDiTBlock(nn.Module):
    """adaLN-gated DiT block: RAttention + SwiGLU (reference dit_c2i_DeCo.py:194-210)."""

    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.bfloat16
    attn_impl: str = "auto"  # "ring" = sequence-parallel (parallel/sp_trunk)
    quantize: bool = False  # int8 attention/MLP GEMMs (adaLN stays bf16)

    @nn.compact
    def __call__(self, x, c, rope, mask=None):
        hidden = x.shape[-1]
        mod = nn.Dense(
            6 * hidden, dtype=self.dtype, name="adaLN_modulation"
        )(c)
        (shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp) = jnp.split(
            mod, 6, axis=-1
        )
        h = modulate(RMSNorm(name="norm1")(x), shift_msa, scale_msa)
        x = x + gate_msa * RAttention(
            num_heads=self.num_heads, dtype=self.dtype, name="attn",
            attn_impl=self.attn_impl, quantize=self.quantize,
        )(h, rope, mask)
        h = modulate(RMSNorm(name="norm2")(x), shift_mlp, scale_mlp)
        x = x + gate_mlp * SwiGLU(
            hidden_dim=int(hidden * self.mlp_ratio), dtype=self.dtype, name="mlp",
            quantize=self.quantize,
        )(h)
        return x


class JointDiTBlock(nn.Module):
    """t2i encoder block: joint image-text attention + SwiGLU (dit_t2i_pixnerd.py:66-85)."""

    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.bfloat16
    attn_impl: str = "auto"  # "ring" = sequence-parallel (sp_trunk joint)
    quantize: bool = False  # int8 attention/MLP GEMMs (adaLN stays bf16)

    @nn.compact
    def __call__(self, x, y, c, rope):
        hidden = x.shape[-1]
        mod = nn.Dense(6 * hidden, dtype=self.dtype, name="adaLN_modulation")(c)
        (shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp) = jnp.split(
            mod, 6, axis=-1
        )
        h = modulate(RMSNorm(name="norm1")(x), shift_msa, scale_msa)
        x = x + gate_msa * JointAttention(
            num_heads=self.num_heads, dtype=self.dtype, name="attn",
            attn_impl=self.attn_impl, quantize=self.quantize,
        )(h, y, rope)
        h = modulate(RMSNorm(name="norm2")(x), shift_mlp, scale_mlp)
        x = x + gate_mlp * SwiGLU(
            hidden_dim=int(hidden * self.mlp_ratio), exact_hidden=True,
            dtype=self.dtype, name="mlp", quantize=self.quantize,
        )(h)
        return x


class TextRefineBlock(nn.Module):
    """Text self-attention refinement block (dit_t2i_pixnerd.py:146-198)."""

    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.bfloat16
    quantize: bool = False  # int8 attention/MLP GEMMs (adaLN stays bf16)

    @nn.compact
    def __call__(self, x, c):
        b, n, hidden = x.shape
        head_dim = hidden // self.num_heads
        dense = Int8Dense if self.quantize else nn.Dense
        mod = nn.Dense(6 * hidden, dtype=self.dtype, name="adaLN_modulation")(c)
        (shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp) = jnp.split(
            mod, 6, axis=-1
        )
        h = modulate(RMSNorm(name="norm1")(x), shift_msa, scale_msa)
        qkv = dense(3 * hidden, use_bias=False, dtype=self.dtype, name="attn_qkv")(h)
        qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q = RMSNorm(name="attn_q_norm")(q)
        k = RMSNorm(name="attn_k_norm")(k)
        attn_out = sdpa(q, k, v, dtype=self.dtype).reshape(b, n, hidden)
        attn_out = dense(hidden, dtype=self.dtype, name="attn_proj")(attn_out)
        x = x + gate_msa * attn_out
        h = modulate(RMSNorm(name="norm2")(x), shift_mlp, scale_mlp)
        x = x + gate_mlp * SwiGLU(
            hidden_dim=int(hidden * self.mlp_ratio), exact_hidden=True,
            dtype=self.dtype, name="mlp", quantize=self.quantize,
        )(h)
        return x


# ---------------------------------------------------------------------------
# Pixel-decoder building blocks
# ---------------------------------------------------------------------------


def nerf_dct_basis(patch_size: int, max_freqs: int) -> np.ndarray:
    """Per-pixel 2-D DCT positional features (reference NerfEmbedder :212-248).

    Returns (patch_size**2, max_freqs**2) float32:
    ``dct[(i,j), (fx,fy)] = cos(x_j*fx*pi) * cos(y_i*fy*pi) / (1 + fx*fy)``
    with x/y in linspace(0,1) and f in linspace(0, max_freqs, max_freqs).
    """
    pos = np.linspace(0, 1, patch_size)
    y_grid, x_grid = np.meshgrid(pos, pos, indexing="ij")
    x_flat = x_grid.reshape(-1, 1, 1)
    y_flat = y_grid.reshape(-1, 1, 1)
    freqs = np.linspace(0, max_freqs, max_freqs)
    fx = freqs[None, :, None]
    fy = freqs[None, None, :]
    coeffs = (1 + fx * fy) ** -1
    dct = np.cos(x_flat * fx * np.pi) * np.cos(y_flat * fy * np.pi) * coeffs
    return dct.reshape(patch_size**2, max_freqs**2).astype(np.float32)


class NerfEmbedder(nn.Module):
    """Concat per-pixel DCT positional basis, then linear embed.

    Input: (..., P^2, C) per-patch pixels; output (..., P^2, hidden).
    """

    hidden_size: int
    max_freqs: int = 8
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        p2 = x.shape[-2]
        patch_size = int(round(math.sqrt(p2)))
        basis = jnp.asarray(nerf_dct_basis(patch_size, self.max_freqs), self.dtype)
        basis = jnp.broadcast_to(basis, x.shape[:-1] + (self.max_freqs**2,))
        x = jnp.concatenate([x.astype(self.dtype), basis], axis=-1)
        return nn.Dense(
            self.hidden_size,
            dtype=self.dtype,
            kernel_init=nn.initializers.xavier_uniform(),
            name="embedder",
        )(x)


class AdaLNResBlock(nn.Module):
    """Pixel-decoder ResBlock with per-pixel adaLN condition (dit_c2i_DeCo.py:288-331).

    x: (..., P^2, C); y: (..., P^2, C) per-pixel condition.
    """

    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, y):
        channels = x.shape[-1]
        mod = nn.Dense(
            3 * channels,
            dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="adaLN_modulation",
        )(nn.silu(y))
        shift_mlp, scale_mlp, gate_mlp = jnp.split(mod, 3, axis=-1)
        h = nn.LayerNorm(
            epsilon=1e-6, dtype=self.dtype, name="in_ln"
        )(x)
        h = modulate(h, shift_mlp, scale_mlp)
        h = nn.Dense(
            channels, dtype=self.dtype,
            kernel_init=nn.initializers.xavier_uniform(), name="mlp_0",
        )(h)
        h = nn.silu(h)
        h = nn.Dense(
            channels, dtype=self.dtype,
            kernel_init=nn.initializers.xavier_uniform(), name="mlp_2",
        )(h)
        return x + gate_mlp * h


def run_pixel_decoder(x_pix, s, *, decoder_chunks=0, grad_checkpoint=False,
                      name="dec_net", **dec_fields):
    """Run :class:`SimpleMLPAdaLN` over per-patch pixels, optionally chunked.

    ``x_pix``: (B, L, P^2, C) per-pixel features; ``s``: (B, L, z) patch
    conditions. ``decoder_chunks > 1`` lax.scans the decoder over L-chunks
    under whole-chunk remat so the per-pixel intermediates — the measured
    512px-training HBM peak (the reference works around it with
    accumulate_grad_batches, configs_c2i/DeCo_XL_512.yaml:15) — only live
    for L/chunks patches at a time. Chunked and unchunked share parameter
    paths, so checkpoints are interchangeable. Shared by the c2i and t2i
    models (``DeCoC2I.decoder_chunks`` / ``DeCoT2I.decoder_chunks``); must
    be called inside a parent ``@nn.compact``.
    """
    b, L = x_pix.shape[0], x_pix.shape[1]
    if decoder_chunks > 1 and L % decoder_chunks:
        raise ValueError(
            f"decoder_chunks={decoder_chunks} does not divide the "
            f"{L}-patch grid; pick a divisor of L (the knob exists to bound "
            f"the 512px+ decoder HBM peak — silently falling back would "
            f"reintroduce the OOM it prevents)"
        )
    if decoder_chunks > 1:
        # scan over patch chunks: each chunk's decoder internals are
        # rematerialized in the backward, so the live per-pixel working set
        # is one chunk (+ the saved xs), not the full L. Inner per-block
        # remat is redundant under the whole-chunk remat.
        k = decoder_chunks
        Dec = nn.scan(
            nn.remat(SimpleMLPAdaLN, methods=["scan_body"],
                     prevent_cse=False),
            variable_broadcast="params", split_rngs={"params": False},
            in_axes=1, out_axes=1, methods=["scan_body"],
        )
        xs = x_pix.reshape((b, k, L // k) + x_pix.shape[2:])
        zs = s.reshape((b, k, L // k) + s.shape[2:])
        _, out = Dec(**dec_fields, grad_checkpoint=False,
                     name=name).scan_body(None, xs, zs)
        return out.reshape((b, L) + out.shape[3:])
    return SimpleMLPAdaLN(
        **dec_fields, grad_checkpoint=grad_checkpoint, name=name
    )(x_pix, s)


class SimpleMLPAdaLN(nn.Module):
    """DeCo per-patch pixel decoder (reference dit_c2i_DeCo.py:334-415).

    x: (B, L, P^2, C_in) per-patch pixel features; z: (B, L, z_channels) patch
    condition. The ``cond_embed`` produces P^2 per-pixel conditions from the
    patch token — this is the DeCo decoupling mechanism (SURVEY §7): each pixel
    in the patch gets its own modulation vector.
    """

    model_channels: int
    out_channels: int
    num_res_blocks: int
    patch_size: int
    dtype: Dtype = jnp.bfloat16
    grad_checkpoint: bool = False

    def __call__(self, x, z):
        return self._body(x, z)

    def scan_body(self, carry, x, z):
        """(carry, x, z) adapter: lets ``nn.scan``/``nn.remat`` lift this
        decoder over a patch-chunk axis (DeCoC2I ``decoder_chunks``) without
        changing any parameter path — chunked and unchunked checkpoints are
        interchangeable."""
        return carry, self._body(x, z)

    @nn.compact
    def _body(self, x, z):
        x = nn.Dense(
            self.model_channels, dtype=self.dtype,
            kernel_init=nn.initializers.xavier_uniform(), name="input_proj",
        )(x)
        c = nn.Dense(
            self.patch_size**2 * self.model_channels,
            dtype=self.dtype,
            kernel_init=nn.initializers.xavier_uniform(),
            name="cond_embed",
        )(z)
        y = c.reshape(c.shape[:-1] + (self.patch_size**2, self.model_channels))
        # per-block remat: the per-pixel (B, L, P^2, C) activations dominate
        # training HBM; one remat scope per res block keeps the backward
        # working set at a single block's intermediates. prevent_cse must stay
        # True here — outside nn.scan, XLA CSE would fold the recompute back
        # into the forward and silently keep every activation alive (measured:
        # peak identical to no-remat with prevent_cse=False)
        block_cls = (nn.remat(AdaLNResBlock)
                     if self.grad_checkpoint else AdaLNResBlock)
        for i in range(self.num_res_blocks):
            x = block_cls(dtype=self.dtype, name=f"res_blocks_{i}")(x, y)
        # final: plain LayerNorm + zero-init linear (FinalLayer :275-291)
        x = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False,
                         dtype=self.dtype, name="final_norm")(x)
        return nn.Dense(
            self.out_channels,
            dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="final_linear",
        )(x)


class NerfBlock(nn.Module):
    """Hyper-network pixel-decoder block (PixNerd; reference dit_t2i_pixnerd.py:110-135).

    The patch token generates per-patch MLP weights; fc1 columns are
    L2-normalized. ``normalize_fc2`` mirrors the c2i variant
    (dit_c2i_DeCo.py:251-286) which normalizes fc2 as well.
    """

    mlp_ratio: int = 4
    normalize_fc2: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, s):
        hidden_x = x.shape[-1]
        params = nn.Dense(
            2 * hidden_x * hidden_x * self.mlp_ratio,
            dtype=self.dtype,
            name="param_generator1",
        )(s)
        fc1, fc2 = jnp.split(params, 2, axis=-1)
        fc1 = fc1.reshape(fc1.shape[:-1] + (hidden_x, hidden_x * self.mlp_ratio))
        fc2 = fc2.reshape(fc2.shape[:-1] + (hidden_x * self.mlp_ratio, hidden_x))
        # column-normalize (dim=-2 in the reference)
        fc1 = fc1 / jnp.maximum(
            jnp.linalg.norm(fc1.astype(jnp.float32), axis=-2, keepdims=True), 1e-12
        ).astype(fc1.dtype)
        if self.normalize_fc2:
            fc2 = fc2 / jnp.maximum(
                jnp.linalg.norm(fc2.astype(jnp.float32), axis=-2, keepdims=True), 1e-12
            ).astype(fc2.dtype)
        res = x
        h = RMSNorm(name="norm")(x)
        h = jnp.einsum("...pc,...cd->...pd", h, fc1)
        h = nn.silu(h)
        h = jnp.einsum("...pd,...dc->...pc", h, fc2)
        return h + res
