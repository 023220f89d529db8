"""Flax -> torch state-dict export (HF round-trip).

Reverse of :mod:`deco_tpu.convert.torch_to_flax`: exports trained deco_tpu
params back into the reference's torch naming/layout so checkpoints remain
loadable by the published stack — the equivalent of the reference's HF export
path (``load_vlm.py:1-150``, ``scripts/convert_vae_to_internvl.py:1-214`` of
hhhhzp/DeCo: strip ``model./ema_model./.module./._orig_mod.`` prefixes and
write an AutoModel-loadable folder).

``export_deco_c2i`` produces ``{denoiser.*, ema_denoiser.*}`` keys matching
``lightning_model.state_dict`` (:333-350); :func:`save_torch_checkpoint`
writes a torch-loadable .pt (or .safetensors when available).
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np


def _t(kernel):  # Dense kernel (in, out) -> torch Linear weight (out, in)
    return np.ascontiguousarray(np.asarray(kernel).T)


def _unfold_perm_inv(kernel, in_channels: int, patch_size: int):
    """Inverse of torch_to_flax._unfold_perm: (p2*C, out) -> (out, C*p2)."""
    p2 = patch_size * patch_size
    out_dim = kernel.shape[1]
    k = np.asarray(kernel).reshape(p2, in_channels, out_dim)
    k = np.transpose(k, (2, 1, 0))  # (out, C, p2)
    return np.ascontiguousarray(k.reshape(out_dim, in_channels * p2))


def _export_dit_block(block: dict, out: Dict[str, np.ndarray], prefix: str,
                      layer: int):
    g = lambda tree, *path: np.asarray(_idx(tree, layer, *path))
    out[f"{prefix}adaLN_modulation.0.weight"] = _t(
        g(block, "adaLN_modulation", "kernel"))
    out[f"{prefix}adaLN_modulation.0.bias"] = g(block, "adaLN_modulation", "bias")
    out[f"{prefix}norm1.weight"] = g(block, "norm1", "weight")
    out[f"{prefix}norm2.weight"] = g(block, "norm2", "weight")
    for w in ("w1", "w2", "w3"):
        out[f"{prefix}mlp.{w}.weight"] = _t(g(block, "mlp", w, "kernel"))
    if "qkv" in block["attn"]:
        out[f"{prefix}attn.qkv.weight"] = _t(g(block, "attn", "qkv", "kernel"))
    else:
        out[f"{prefix}attn.qkv_x.weight"] = _t(g(block, "attn", "qkv_x", "kernel"))
        out[f"{prefix}attn.kv_y.weight"] = _t(g(block, "attn", "kv_y", "kernel"))
    out[f"{prefix}attn.q_norm.weight"] = g(block, "attn", "q_norm", "weight")
    out[f"{prefix}attn.k_norm.weight"] = g(block, "attn", "k_norm", "weight")
    out[f"{prefix}attn.proj.weight"] = _t(g(block, "attn", "proj", "kernel"))
    out[f"{prefix}attn.proj.bias"] = g(block, "attn", "proj", "bias")


def _idx(tree, layer, *path):
    node = tree
    for p in path:
        node = node[p]
    return node[layer]


def _export_simple_mlp_adaln(dec: dict, out: Dict[str, np.ndarray], prefix: str):
    out[f"{prefix}input_proj.weight"] = _t(dec["input_proj"]["kernel"])
    out[f"{prefix}input_proj.bias"] = np.asarray(dec["input_proj"]["bias"])
    out[f"{prefix}cond_embed.weight"] = _t(dec["cond_embed"]["kernel"])
    out[f"{prefix}cond_embed.bias"] = np.asarray(dec["cond_embed"]["bias"])
    out[f"{prefix}final_layer.linear.weight"] = _t(dec["final_linear"]["kernel"])
    out[f"{prefix}final_layer.linear.bias"] = np.asarray(
        dec["final_linear"]["bias"])
    i = 0
    while f"res_blocks_{i}" in dec:
        rb = dec[f"res_blocks_{i}"]
        p = f"{prefix}res_blocks.{i}."
        out[p + "in_ln.weight"] = np.asarray(rb["in_ln"]["scale"])
        out[p + "in_ln.bias"] = np.asarray(rb["in_ln"]["bias"])
        out[p + "mlp.0.weight"] = _t(rb["mlp_0"]["kernel"])
        out[p + "mlp.0.bias"] = np.asarray(rb["mlp_0"]["bias"])
        out[p + "mlp.2.weight"] = _t(rb["mlp_2"]["kernel"])
        out[p + "mlp.2.bias"] = np.asarray(rb["mlp_2"]["bias"])
        out[p + "adaLN_modulation.1.weight"] = _t(rb["adaLN_modulation"]["kernel"])
        out[p + "adaLN_modulation.1.bias"] = np.asarray(
            rb["adaLN_modulation"]["bias"])
        i += 1


def export_deco_c2i(params: dict, in_channels: int = 3, patch_size: int = 16,
                    prefix: str = "denoiser.") -> Dict[str, np.ndarray]:
    """DeCoC2I params -> torch dit_c2i_DeCo.PixNerDiT state dict."""
    p = params.get("params", params)
    out: Dict[str, np.ndarray] = {}
    out[prefix + "s_embedder.proj.weight"] = _unfold_perm_inv(
        p["s_embedder"]["proj"]["kernel"], in_channels, patch_size)
    out[prefix + "s_embedder.proj.bias"] = np.asarray(
        p["s_embedder"]["proj"]["bias"])
    out[prefix + "t_embedder.mlp.0.weight"] = _t(p["t_embedder"]["mlp_0"]["kernel"])
    out[prefix + "t_embedder.mlp.0.bias"] = np.asarray(
        p["t_embedder"]["mlp_0"]["bias"])
    out[prefix + "t_embedder.mlp.2.weight"] = _t(p["t_embedder"]["mlp_2"]["kernel"])
    out[prefix + "t_embedder.mlp.2.bias"] = np.asarray(
        p["t_embedder"]["mlp_2"]["bias"])
    out[prefix + "y_embedder.embedding_table.weight"] = np.asarray(
        p["y_embedder"]["embedding"])
    out[prefix + "x_embedder.embedder.0.weight"] = _t(
        p["x_embedder"]["embedder"]["kernel"])
    out[prefix + "x_embedder.embedder.0.bias"] = np.asarray(
        p["x_embedder"]["embedder"]["bias"])
    blocks = p["blocks"]["block"]
    num_layers = blocks["norm1"]["weight"].shape[0]
    for i in range(num_layers):
        _export_dit_block(blocks, out, f"{prefix}blocks.{i}.", i)
    _export_simple_mlp_adaln(p["dec_net"], out, prefix + "dec_net.")
    return out


def _export_swiglu_fused(mlp: dict, out: Dict[str, np.ndarray], prefix: str,
                         layer: int):
    """SwiGLU -> the fused w12 layout (src/models/layers/swiglu.py):
    torch w12 = [w1; gate], torch w3 = output projection (deco w2)."""
    w1 = _t(_idx(mlp, layer, "w1", "kernel"))
    gate = _t(_idx(mlp, layer, "w3", "kernel"))
    out[f"{prefix}mlp.w12.weight"] = np.concatenate([w1, gate], axis=0)
    out[f"{prefix}mlp.w3.weight"] = _t(_idx(mlp, layer, "w2", "kernel"))


def _export_t2i_block(block: dict, out: Dict[str, np.ndarray], prefix: str,
                      layer: int, joint: bool):
    g = lambda *path: np.asarray(_idx(block, layer, *path))
    out[f"{prefix}adaLN_modulation.0.weight"] = _t(
        g("adaLN_modulation", "kernel"))
    out[f"{prefix}adaLN_modulation.0.bias"] = g("adaLN_modulation", "bias")
    out[f"{prefix}norm1.weight"] = g("norm1", "weight")
    out[f"{prefix}norm2.weight"] = g("norm2", "weight")
    _export_swiglu_fused(block["mlp"], out, prefix, layer)
    if joint:
        out[f"{prefix}attn.qkv_x.weight"] = _t(g("attn", "qkv_x", "kernel"))
        out[f"{prefix}attn.kv_y.weight"] = _t(g("attn", "kv_y", "kernel"))
        out[f"{prefix}attn.q_norm.weight"] = g("attn", "q_norm", "weight")
        out[f"{prefix}attn.k_norm.weight"] = g("attn", "k_norm", "weight")
        out[f"{prefix}attn.proj.weight"] = _t(g("attn", "proj", "kernel"))
        out[f"{prefix}attn.proj.bias"] = g("attn", "proj", "bias")
    else:  # text-refine block (flat attn param names in deco_tpu)
        out[f"{prefix}attn.qkv.weight"] = _t(g("attn_qkv", "kernel"))
        out[f"{prefix}attn.q_norm.weight"] = g("attn_q_norm", "weight")
        out[f"{prefix}attn.k_norm.weight"] = g("attn_k_norm", "weight")
        out[f"{prefix}attn.proj.weight"] = _t(g("attn_proj", "kernel"))
        out[f"{prefix}attn.proj.bias"] = g("attn_proj", "bias")


def export_deco_t2i(params: dict, in_channels: int = 3, patch_size: int = 16,
                    prefix: str = "denoiser.") -> Dict[str, np.ndarray]:
    """DeCoT2I params -> torch state dict (config-implied t2i layout)."""
    p = params.get("params", params)
    trunk = p["trunk"]
    out: Dict[str, np.ndarray] = {}
    out[prefix + "s_embedder.proj.weight"] = _unfold_perm_inv(
        trunk["s_embedder"]["proj"]["kernel"], in_channels, patch_size)
    out[prefix + "s_embedder.proj.bias"] = np.asarray(
        trunk["s_embedder"]["proj"]["bias"])
    for a, b in (("mlp_0", "mlp.0"), ("mlp_2", "mlp.2")):
        out[prefix + f"t_embedder.{b}.weight"] = _t(
            trunk["t_embedder"][a]["kernel"])
        out[prefix + f"t_embedder.{b}.bias"] = np.asarray(
            trunk["t_embedder"][a]["bias"])
    out[prefix + "y_embedder.proj.weight"] = _t(
        trunk["y_embedder"]["proj"]["kernel"])
    out[prefix + "y_embedder.proj.bias"] = np.asarray(
        trunk["y_embedder"]["proj"]["bias"])
    out[prefix + "y_embedder.norm.weight"] = np.asarray(
        trunk["y_embedder"]["norm"]["weight"])
    out[prefix + "y_pos_embedding"] = np.asarray(trunk["y_pos_embedding"])
    text = trunk["text_refine_blocks"]["block"]
    for i in range(np.asarray(text["norm1"]["weight"]).shape[0]):
        _export_t2i_block(text, out, f"{prefix}text_refine_blocks.{i}.", i,
                          joint=False)
    blocks = trunk["blocks"]["block"]
    n_enc = np.asarray(blocks["norm1"]["weight"]).shape[0]
    for i in range(n_enc):
        _export_t2i_block(blocks, out, f"{prefix}blocks.{i}.", i, joint=True)
    out[prefix + "x_embedder.embedder.0.weight"] = _t(
        p["x_embedder"]["embedder"]["kernel"])
    out[prefix + "x_embedder.embedder.0.bias"] = np.asarray(
        p["x_embedder"]["embedder"]["bias"])
    _export_simple_mlp_adaln(p["dec_net"], out, prefix + "dec_net.")
    return out


def export_checkpoint(model_params, ema_params=None, model_kind: str = "deco_c2i",
                      **kwargs) -> Dict[str, np.ndarray]:
    """Full checkpoint export: denoiser.* + ema_denoiser.* (lightning layout)."""
    exporters = {"deco_c2i": export_deco_c2i, "deco_t2i": export_deco_t2i}
    export = exporters[model_kind]
    out = export(model_params, prefix="denoiser.", **kwargs)
    if ema_params is not None:
        out.update(export(ema_params, prefix="ema_denoiser.", **kwargs))
    return out


def save_torch_checkpoint(state_dict: Dict[str, np.ndarray], path: str):
    """Write a torch-loadable checkpoint file."""
    import torch

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    torch.save(
        {"state_dict": {k: torch.from_numpy(np.ascontiguousarray(v))
                        for k, v in state_dict.items()}},
        path,
    )
