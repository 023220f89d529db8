"""UniFlow weight bridge: torch UniFlowVisionModel <-> deco_tpu UniFlowVision.

Covers the reference's uniflow checkpoint interchange
(``src/lightning_uniflow_model.py:480-512`` of hhhhzp/DeCo: the custom
state_dict saves the full UniFlowVisionModel under the ``model.`` prefix, the
EMA copy under ``ema_model.``). Torch naming
(``src/models/uniflow/modeling_uniflow.py:1227-1360``):

    embeddings.* / encoder.layers.{i}.*        deep ViT     -> params['vision']
    shallow_embeddings.* / shallow_encoder.*   4L ViT       -> params['shallow']
    mlp1.{0,1,3}.*                             LN+2xLinear  -> mlp1_norm/_fc1/_fc2
    shared_latent_proj.{input,cond,post_shuffle}_proj, res_blocks.{i}, final_layer
    gen_latent_proj.{0,2} / sem_latent_proj.{0,2}
    global_block_pos_embed / sem_global_block_pos_embed
    (sem_)global_blocks.{i}.{norm1,attn,norm2,mlp}   FlattenDiTBlock (fused w12)
    (sem_)flow_head.nerf_embedder.embedder.0, .net.{time_embed.mlp.{0,2},
        cond_embed, input_proj, res_blocks.{i}, final_layer}

``mask_token`` exists only on the flax side (the reference commented its CFG
mask token out, modeling_uniflow.py:760); export writes it under
``{head}.mask_token`` and import zero-fills when absent, so a reference
checkpoint loads exactly and a deco_tpu round-trip is identity.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from deco_tpu.convert.vit_bridge import vit_params_from_torch, vit_params_to_torch


def _t(w):
    return np.ascontiguousarray(np.asarray(w).T)


def _strip_prefix(sd: Dict[str, np.ndarray], use_ema: bool = False
                  ) -> Dict[str, np.ndarray]:
    """Select the ``model.`` (or ``ema_model.``) namespace when present."""
    want = "ema_model." if use_ema else "model."
    if any(k.startswith(want) for k in sd):
        return {k[len(want):]: v for k, v in sd.items() if k.startswith(want)}
    return sd


def _num_indexed(sd, pattern):
    """Count distinct {i} occupancies of ``pattern.format(i)`` key prefixes."""
    i = 0
    while any(k.startswith(pattern.format(i)) for k in sd):
        i += 1
    return i


# ---------------------------------------------------------------------------
# torch -> flax building blocks
# ---------------------------------------------------------------------------

def _linear(sd, name):
    out = {"kernel": _t(sd[name + ".weight"])}
    if name + ".bias" in sd:
        out["bias"] = np.asarray(sd[name + ".bias"])
    return out


def _res_block(sd, pre):
    return {
        "in_ln": {"scale": np.asarray(sd[pre + "in_ln.weight"]),
                  "bias": np.asarray(sd[pre + "in_ln.bias"])},
        "mlp_0": _linear(sd, pre + "mlp.0"),
        "mlp_2": _linear(sd, pre + "mlp.2"),
        "adaLN_modulation": _linear(sd, pre + "adaLN_modulation.1"),
    }


def _final_layer(sd, pre):
    return {
        "adaLN_modulation": _linear(sd, pre + "adaLN_modulation.1"),
        "linear": _linear(sd, pre + "linear"),
    }


def _dit_block(sd, pre):
    """FlattenDiTBlock: RMSNorm + head-dim qk-norm attention + fused SwiGLU."""
    w12 = np.asarray(sd[pre + "mlp.w12.weight"])
    half = w12.shape[0] // 2
    attn = {
        "qkv": {"kernel": _t(sd[pre + "attn.qkv.weight"])},
        "proj": _linear(sd, pre + "attn.proj"),
        "q_norm": {"weight": np.asarray(sd[pre + "attn.q_norm.weight"])},
        "k_norm": {"weight": np.asarray(sd[pre + "attn.k_norm.weight"])},
    }
    if pre + "attn.qkv.bias" in sd:
        attn["qkv"]["bias"] = np.asarray(sd[pre + "attn.qkv.bias"])
    return {
        "norm1": {"weight": np.asarray(sd[pre + "norm1.weight"])},
        "norm2": {"weight": np.asarray(sd[pre + "norm2.weight"])},
        "attn": attn,
        "mlp": {
            "w1": {"kernel": _t(w12[:half])},
            "w3": {"kernel": _t(w12[half:])},
            "w2": {"kernel": _t(sd[pre + "mlp.w3.weight"])},
        },
    }


def _simple_mlp_adaln(sd, pre):
    out = {
        "time_embed": {"mlp_0": _linear(sd, pre + "time_embed.mlp.0"),
                       "mlp_2": _linear(sd, pre + "time_embed.mlp.2")},
        "cond_embed": _linear(sd, pre + "cond_embed"),
        "input_proj": _linear(sd, pre + "input_proj"),
        "final_layer": _final_layer(sd, pre + "final_layer."),
    }
    for i in range(_num_indexed(sd, pre + "res_blocks.{}.")):
        out[f"res_blocks_{i}"] = _res_block(sd, pre + f"res_blocks.{i}.")
    return out


def _flow_decoder(sd, pre, z_channels):
    out = {
        "nerf_embedder": {"embedder": _linear(sd, pre + "nerf_embedder.embedder.0")},
        "net": _simple_mlp_adaln(sd, pre + "net."),
    }
    if pre + "mask_token" in sd:
        out["mask_token"] = np.asarray(sd[pre + "mask_token"])
    else:
        out["mask_token"] = np.zeros((1, 1, z_channels), np.float32)
    return out


def _latent_projector(sd, pre):
    out = {
        "input_proj": _linear(sd, pre + "input_proj"),
        "cond_proj": _linear(sd, pre + "cond_proj"),
        "post_shuffle_proj": _linear(sd, pre + "post_shuffle_proj"),
        "final_layer": _final_layer(sd, pre + "final_layer."),
    }
    for i in range(_num_indexed(sd, pre + "res_blocks.{}.")):
        out[f"res_blocks_{i}"] = _res_block(sd, pre + f"res_blocks.{i}.")
    return out


def uniflow_params_from_torch(sd: Dict[str, np.ndarray],
                              norm_type: str = "auto",
                              use_ema: bool = False) -> dict:
    """torch UniFlow state dict (lightning or bare model) -> UniFlowVision params.

    ``norm_type='auto'`` detects LayerNorm vs RMSNorm encoder norms from the
    presence of a norm bias (InternVL3-2B ships rms_norm,
    configuration_uniflow.py:27; smaller configs use layer_norm).
    """
    sd = _strip_prefix(sd, use_ema=use_ema)
    if norm_type == "auto":
        norm_type = ("layer_norm" if "encoder.layers.0.norm1.bias" in sd
                     else "rms_norm")
    deep = {k[len("encoder."):]: v for k, v in sd.items() if k.startswith("encoder.")}
    deep.update({k: v for k, v in sd.items() if k.startswith("embeddings.")})
    deep = {("encoder." + k if k.startswith("layers.") else k): v
            for k, v in deep.items()}
    shallow = {}
    for k, v in sd.items():
        if k.startswith("shallow_encoder."):
            shallow["encoder." + k[len("shallow_encoder."):]] = v
        elif k.startswith("shallow_embeddings."):
            shallow["embeddings." + k[len("shallow_embeddings."):]] = v
    n_deep = _num_indexed(deep, "encoder.layers.{}.")
    n_shallow = _num_indexed(shallow, "encoder.layers.{}.")
    params: dict = {
        "vision": vit_params_from_torch(deep, n_deep, norm_type=norm_type),
        "shallow": vit_params_from_torch(shallow, n_shallow, norm_type=norm_type),
        "mlp1_norm": {"scale": np.asarray(sd["mlp1.0.weight"]),
                      "bias": np.asarray(sd["mlp1.0.bias"])},
        "mlp1_fc1": _linear(sd, "mlp1.1"),
        "mlp1_fc2": _linear(sd, "mlp1.3"),
    }
    if "shared_latent_proj.input_proj.weight" in sd:
        params["shared_latent_proj"] = _latent_projector(sd, "shared_latent_proj.")
    for branch, tpre in (("", "gen_latent_proj"), ("sem_", "sem_latent_proj")):
        if f"{tpre}.0.weight" in sd:
            params[f"{tpre}_fc1"] = _linear(sd, f"{tpre}.0")
            params[f"{tpre}_fc2"] = _linear(sd, f"{tpre}.2")
        pe = f"{branch}global_block_pos_embed"
        if pe in sd:
            params[pe] = np.asarray(sd[pe])
        for i in range(_num_indexed(sd, f"{branch}global_blocks.{{}}.")):
            params[f"{branch}global_blocks_{i}"] = _dit_block(
                sd, f"{branch}global_blocks.{i}.")
        head = "flow_head" if branch == "" else "sem_flow_head"
        if f"{head}.net.input_proj.weight" in sd:
            zc = np.asarray(sd[f"{head}.net.cond_embed.weight"]).shape[1]
            params[head] = _flow_decoder(sd, head + ".", zc)
    return params


# ---------------------------------------------------------------------------
# flax -> torch
# ---------------------------------------------------------------------------

def _exp_linear(out, name, tree):
    out[name + ".weight"] = _t(tree["kernel"])
    if "bias" in tree:
        out[name + ".bias"] = np.asarray(tree["bias"])


def _exp_res_block(out, pre, tree):
    out[pre + "in_ln.weight"] = np.asarray(tree["in_ln"]["scale"])
    out[pre + "in_ln.bias"] = np.asarray(tree["in_ln"]["bias"])
    _exp_linear(out, pre + "mlp.0", tree["mlp_0"])
    _exp_linear(out, pre + "mlp.2", tree["mlp_2"])
    _exp_linear(out, pre + "adaLN_modulation.1", tree["adaLN_modulation"])


def _exp_final_layer(out, pre, tree):
    _exp_linear(out, pre + "adaLN_modulation.1", tree["adaLN_modulation"])
    _exp_linear(out, pre + "linear", tree["linear"])


def _exp_dit_block(out, pre, tree):
    out[pre + "norm1.weight"] = np.asarray(tree["norm1"]["weight"])
    out[pre + "norm2.weight"] = np.asarray(tree["norm2"]["weight"])
    attn = tree["attn"]
    out[pre + "attn.qkv.weight"] = _t(attn["qkv"]["kernel"])
    if "bias" in attn["qkv"]:
        out[pre + "attn.qkv.bias"] = np.asarray(attn["qkv"]["bias"])
    _exp_linear(out, pre + "attn.proj", attn["proj"])
    out[pre + "attn.q_norm.weight"] = np.asarray(attn["q_norm"]["weight"])
    out[pre + "attn.k_norm.weight"] = np.asarray(attn["k_norm"]["weight"])
    mlp = tree["mlp"]
    out[pre + "mlp.w12.weight"] = np.concatenate(
        [_t(mlp["w1"]["kernel"]), _t(mlp["w3"]["kernel"])], axis=0)
    out[pre + "mlp.w3.weight"] = _t(mlp["w2"]["kernel"])


def _exp_simple_mlp(out, pre, tree):
    _exp_linear(out, pre + "time_embed.mlp.0", tree["time_embed"]["mlp_0"])
    _exp_linear(out, pre + "time_embed.mlp.2", tree["time_embed"]["mlp_2"])
    _exp_linear(out, pre + "cond_embed", tree["cond_embed"])
    _exp_linear(out, pre + "input_proj", tree["input_proj"])
    _exp_final_layer(out, pre + "final_layer.", tree["final_layer"])
    for k in sorted(k for k in tree if k.startswith("res_blocks_")):
        i = int(k.split("_")[-1])
        _exp_res_block(out, pre + f"res_blocks.{i}.", tree[k])


def uniflow_params_to_torch(params: dict, norm_type: str = "auto",
                            prefix: str = "model.") -> Dict[str, np.ndarray]:
    """UniFlowVision params -> reference-layout state dict (``model.`` prefix)."""
    p = params.get("params", params)
    if norm_type == "auto":
        stacked = p["vision"]["encoder"]["layers"]["layer"]
        norm_type = "layer_norm" if "bias" in stacked["norm1"] else "rms_norm"
    out: Dict[str, np.ndarray] = {}
    for k, v in vit_params_to_torch(p["vision"], norm_type=norm_type).items():
        out[k] = v
    for k, v in vit_params_to_torch(p["shallow"], norm_type=norm_type).items():
        out["shallow_" + k] = v  # shallow_embeddings. / shallow_encoder.
    out["mlp1.0.weight"] = np.asarray(p["mlp1_norm"]["scale"])
    out["mlp1.0.bias"] = np.asarray(p["mlp1_norm"]["bias"])
    _exp_linear(out, "mlp1.1", p["mlp1_fc1"])
    _exp_linear(out, "mlp1.3", p["mlp1_fc2"])
    if "shared_latent_proj" in p:
        t = p["shared_latent_proj"]
        _exp_linear(out, "shared_latent_proj.input_proj", t["input_proj"])
        _exp_linear(out, "shared_latent_proj.cond_proj", t["cond_proj"])
        _exp_linear(out, "shared_latent_proj.post_shuffle_proj",
                    t["post_shuffle_proj"])
        _exp_final_layer(out, "shared_latent_proj.final_layer.", t["final_layer"])
        for k in sorted(k for k in t if k.startswith("res_blocks_")):
            i = int(k.split("_")[-1])
            _exp_res_block(out, f"shared_latent_proj.res_blocks.{i}.", t[k])
    for tpre in ("gen_latent_proj", "sem_latent_proj"):
        if f"{tpre}_fc1" in p:
            _exp_linear(out, f"{tpre}.0", p[f"{tpre}_fc1"])
            _exp_linear(out, f"{tpre}.2", p[f"{tpre}_fc2"])
    for branch in ("", "sem_"):
        pe = f"{branch}global_block_pos_embed"
        if pe in p:
            out[pe] = np.asarray(p[pe])
        for k in sorted(k for k in p if k.startswith(f"{branch}global_blocks_")
                        and (branch or not k.startswith("sem_"))):
            i = int(k.split("_")[-1])
            _exp_dit_block(out, f"{branch}global_blocks.{i}.", p[k])
        head = "flow_head" if branch == "" else "sem_flow_head"
        if head in p:
            _exp_linear(out, head + ".nerf_embedder.embedder.0",
                        p[head]["nerf_embedder"]["embedder"])
            _exp_simple_mlp(out, head + ".net.", p[head]["net"])
            out[head + ".mask_token"] = np.asarray(p[head]["mask_token"])
    return {prefix + k: v for k, v in out.items()}
