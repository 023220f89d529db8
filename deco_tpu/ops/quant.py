"""Dynamic int8 quantized matmul for the DiT trunk (opt-in serving mode).

v5e's MXU executes int8xint8->int32 at 2x the bf16 rate (394 vs 197 TOPS).
Measured on the real chip at the DeCo-XL trunk GEMM shape (rows=10240,
1152x3456, chained-scan protocol, scripts/bench_int8_probe.py): int8 131 vs
bf16 103 effective TFLOP/s = +27% on the raw matmul including the dynamic
activation-quantization overhead.

Scheme (standard W8A8 post-training quantization):
- weights: symmetric per-output-channel scale (amax/127 over the reduction
  axis), quantized once per dispatch -- loop-invariant inside the sampler
  scan, so XLA hoists it out of the 50-step loop;
- activations: symmetric per-token (per-row) dynamic scale, recomputed every
  call;
- accumulation in int32 (`preferred_element_type`), rescale in fp32.

This changes numerics, so it is OPT-IN (`DeCoC2I(quantize="int8")` or the
``DECO_QUANT=int8`` env override) and never the default: golden-parity tests
pin the bf16/fp32 path. The reference has no quantized path at all
(everything runs bf16 autocast, src/diffusion/base/sampling.py:27).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

_EPS = 1e-8


def env_quant_mode() -> str | None:
    """Global override: DECO_QUANT=int8 forces trunk quantization on.

    Unrecognized values raise (matching the ``quantize=`` constructor-arg
    validation): an operator who sets ``DECO_QUANT=int4`` or typos ``INT8``
    must not silently run the exact bf16 path believing it is quantized.
    """
    mode = os.environ.get("DECO_QUANT")
    if mode in (None, ""):
        return None
    if mode != "int8":
        raise ValueError(
            f"DECO_QUANT={mode!r}: the only supported mode is 'int8' "
            "(unset it or leave it empty for the exact bf16 path)"
        )
    return mode


def model_quant_active(model) -> bool:
    """Whether ``model`` resolves to the int8 trunk (field or env override)."""
    return (getattr(model, "quantize", None) or env_quant_mode()) == "int8"


def refresh_quant_cache(model, variables, *apply_args, **apply_kwargs):
    """(Re)build the int8 weight cache from ``variables['params']``.

    Runs one ``mutable='quant'`` apply so the cached int8 kernels are
    quantized from the CURRENT params — call this after ANY checkpoint /
    converted-weight load. A cache populated at ``model.init`` time and then
    carried alongside *restored* params serves garbage (measured 1.37 max
    relative error on the trunk output): the forward reads only the cache,
    so it must always be derived from the weights actually in use.
    ``apply_args`` only need to be shape-valid (a batch-1 example is fine;
    the cache depends on params alone, not on the inputs).
    """
    params = variables["params"] if "params" in variables else variables
    _, qvars = model.apply(
        {"params": params}, *apply_args, mutable="quant", **apply_kwargs
    )
    if "quant" not in qvars:
        # model has no quantized modules (e.g. a global DECO_QUANT=int8 with
        # a family that doesn't support it) — nothing to cache
        return {"params": params}
    return {"params": params, "quant": qvars["quant"]}


def quantize_rowwise(x: jax.Array):
    """Symmetric per-row int8 quantization over the last axis.

    Returns (q: int8, scale: f32 with a trailing keepdim axis).
    """
    xf = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    scale = jnp.maximum(scale, _EPS)
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_weight(kernel: jax.Array):
    """Symmetric per-output-channel int8 quantization of a (K, N) kernel."""
    kf = kernel.astype(jnp.float32)
    scale = jnp.max(jnp.abs(kf), axis=0, keepdims=True) / 127.0
    scale = jnp.maximum(scale, _EPS)
    q = jnp.clip(jnp.round(kf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def int8_matmul_prequant(x: jax.Array, wq: jax.Array, ws: jax.Array) -> jax.Array:
    """``x @ dequant(wq, ws)`` with a pre-quantized (int8, f32-scale) weight.

    The weight must be quantized OUTSIDE any sampler scan (via the model's
    ``quant`` variable collection — see models/layers.Int8Dense): measured
    in-context, re-quantizing the 446M DeCo-XL trunk weights inside the
    50-step loop costs ~1.8 GB/step of HBM traffic and erases the MXU win.
    """
    xq, xs = quantize_rowwise(x)
    y = jax.lax.dot_general(
        xq, wq,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return y.astype(jnp.float32) * xs * ws


def int8_matmul(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """``x @ kernel`` via int8 MXU ops; x: (..., K), kernel: (K, N) fp32.

    Quantizes the weight on the fly — only correct/fast when the call is not
    inside a scan (prefer the ``quant``-collection path for sampling loops).
    Returns fp32. Backward is not defined on purpose -- the quantized path is
    an inference-only serving mode (training keeps bf16 gradients exact).
    """
    wq, ws = quantize_weight(kernel)
    return int8_matmul_prequant(x, wq, ws)
