"""InternViT weight bridge: HF/torch InternVisionModel <-> deco_tpu VisionModel.

Covers the reference's pretrained-loading and export paths:
- UniFlow ``configure_model`` loads InternVL3-2B vision weights into the
  encoder (``src/lightning_uniflow_model.py:145-179`` of hhhhzp/DeCo);
- ``load_vlm.py`` / ``scripts/convert_vae_to_internvl.py`` write trained
  encoders back into an InternVL-format HF folder.

Torch naming (modeling_intern_vit.py):
    embeddings.class_embedding                      (1, 1, C)
    embeddings.position_embedding                   (1, N+1, C)
    embeddings.patch_embedding.weight/bias          conv (C, 3, p, p)
    encoder.layers.{i}.norm1.weight[/bias]
    encoder.layers.{i}.attn.qkv.weight[/bias]
    encoder.layers.{i}.attn.q_norm.weight           (full-dim, qk_normalization)
    encoder.layers.{i}.attn.k_norm.weight
    encoder.layers.{i}.attn.proj.weight/bias
    encoder.layers.{i}.mlp.fc1.weight/bias
    encoder.layers.{i}.mlp.fc2.weight/bias
    encoder.layers.{i}.norm2.weight[/bias]
    encoder.layers.{i}.ls1 / ls2                    (C,)
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _t(w):
    return np.ascontiguousarray(np.asarray(w).T)


def vit_params_from_torch(sd: Dict[str, np.ndarray], num_layers: int,
                          norm_type: str = "layer_norm") -> dict:
    """torch InternVisionModel state dict -> VisionModel params."""
    g = lambda k: np.asarray(sd[k])
    conv_w = g("embeddings.patch_embedding.weight")  # (C, 3, p, p) OIHW
    params: dict = {
        "embeddings": {
            "class_embedding": g("embeddings.class_embedding"),
            "position_embedding": g("embeddings.position_embedding"),
            "patch_embedding": {
                "kernel": conv_w.transpose(2, 3, 1, 0),  # HWIO
                "bias": g("embeddings.patch_embedding.bias"),
            },
        },
    }
    layers = []
    for i in range(num_layers):
        p = f"encoder.layers.{i}."
        layer: dict = {
            "qkv": {"kernel": _t(g(p + "attn.qkv.weight"))},
            "proj": {"kernel": _t(g(p + "attn.proj.weight")),
                     "bias": g(p + "attn.proj.bias")},
            "fc1": {"kernel": _t(g(p + "mlp.fc1.weight")),
                    "bias": g(p + "mlp.fc1.bias")},
            "fc2": {"kernel": _t(g(p + "mlp.fc2.weight")),
                    "bias": g(p + "mlp.fc2.bias")},
            "ls1": g(p + "ls1"),
            "ls2": g(p + "ls2"),
        }
        if p + "attn.qkv.bias" in sd:
            layer["qkv"]["bias"] = g(p + "attn.qkv.bias")
        for norm in ("norm1", "norm2"):
            if norm_type == "rms_norm":
                layer[norm] = {"weight": g(p + f"{norm}.weight")}
            else:
                layer[norm] = {"scale": g(p + f"{norm}.weight"),
                               "bias": g(p + f"{norm}.bias")}
        if p + "attn.q_norm.weight" in sd:
            layer["q_norm"] = {"weight": g(p + "attn.q_norm.weight")}
            layer["k_norm"] = {"weight": g(p + "attn.k_norm.weight")}
        layers.append(layer)
    # stack per-layer for the nn.scan parameter tree
    stacked: dict = {}

    def rec(trees, path, out):
        for k in trees[0]:
            vals = [t[k] for t in trees]
            if isinstance(vals[0], dict):
                rec(vals, path + [k], out.setdefault(k, {}))
            else:
                out[k] = np.stack(vals, axis=0)

    rec(layers, [], stacked)
    params["encoder"] = {"layers": {"layer": stacked}}
    return params


def vit_params_to_torch(params: dict, norm_type: str = "layer_norm"
                        ) -> Dict[str, np.ndarray]:
    """VisionModel params -> torch InternVisionModel state dict (HF export)."""
    p = params.get("params", params)
    emb = p["embeddings"]
    out: Dict[str, np.ndarray] = {
        "embeddings.class_embedding": np.asarray(emb["class_embedding"]),
        "embeddings.position_embedding": np.asarray(emb["position_embedding"]),
        "embeddings.patch_embedding.weight": np.asarray(
            emb["patch_embedding"]["kernel"]).transpose(3, 2, 0, 1),
        "embeddings.patch_embedding.bias": np.asarray(
            emb["patch_embedding"]["bias"]),
    }
    stacked = p["encoder"]["layers"]["layer"]
    num_layers = np.asarray(stacked["ls1"]).shape[0]

    def leaf(path, i):
        node = stacked
        for k in path:
            node = node[k]
        return np.asarray(node)[i]

    for i in range(num_layers):
        pre = f"encoder.layers.{i}."
        out[pre + "attn.qkv.weight"] = _t(leaf(["qkv", "kernel"], i))
        if "bias" in stacked["qkv"]:
            out[pre + "attn.qkv.bias"] = leaf(["qkv", "bias"], i)
        out[pre + "attn.proj.weight"] = _t(leaf(["proj", "kernel"], i))
        out[pre + "attn.proj.bias"] = leaf(["proj", "bias"], i)
        out[pre + "mlp.fc1.weight"] = _t(leaf(["fc1", "kernel"], i))
        out[pre + "mlp.fc1.bias"] = leaf(["fc1", "bias"], i)
        out[pre + "mlp.fc2.weight"] = _t(leaf(["fc2", "kernel"], i))
        out[pre + "mlp.fc2.bias"] = leaf(["fc2", "bias"], i)
        out[pre + "ls1"] = leaf(["ls1"], i)
        out[pre + "ls2"] = leaf(["ls2"], i)
        for norm in ("norm1", "norm2"):
            if norm_type == "rms_norm":
                out[pre + f"{norm}.weight"] = leaf([norm, "weight"], i)
            else:
                out[pre + f"{norm}.weight"] = leaf([norm, "scale"], i)
                out[pre + f"{norm}.bias"] = leaf([norm, "bias"], i)
        if "q_norm" in stacked:
            out[pre + "attn.q_norm.weight"] = leaf(["q_norm", "weight"], i)
            out[pre + "attn.k_norm.weight"] = leaf(["k_norm", "weight"], i)
    return out


def export_internvl_folder(vision_params: dict, out_dir: str,
                           config: dict, mlp1_state: Dict[str, np.ndarray] = None,
                           tokenizer_src: str = None):
    """Write an InternVL-format HF folder (convert_vae_to_internvl.py parity).

    ``config`` becomes vision_config inside config.json; tokenizer files are
    copied from ``tokenizer_src`` when provided.
    """
    import json
    import os
    import shutil

    os.makedirs(out_dir, exist_ok=True)
    sd = vit_params_to_torch(vision_params,
                             norm_type=config.get("norm_type", "layer_norm"))
    if mlp1_state:
        sd.update({f"mlp1.{k}": v for k, v in mlp1_state.items()})
    from deco_tpu.convert.flax_to_torch import save_torch_checkpoint

    save_torch_checkpoint(sd, os.path.join(out_dir, "pytorch_model.bin"))
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump({"vision_config": config, "model_type": "internvl_chat"}, f,
                  indent=2)
    if tokenizer_src and os.path.isdir(tokenizer_src):
        for fn in os.listdir(tokenizer_src):
            if "token" in fn or fn.endswith(".model"):
                shutil.copy(os.path.join(tokenizer_src, fn), out_dir)


def load_teacher_feature_fn(model_dir: str, dtype=None):
    """Frozen InternVL teacher feature extractor for UniFlow distillation.

    TPU-native equivalent of the reference's LightweightTeacherModel
    (``src/lightning_uniflow_model.py:523-564``): loads the vision tower +
    mlp1 from an InternVL HF folder, returns a jitted
    ``fn(x_minus1_1) -> {"vit_embeds", "vit_embeds_mlp"}`` where vit_embeds
    is the pixel-shuffle(x0.5)-downsampled last hidden state and
    vit_embeds_mlp its mlp1 projection. Weights-gated: requires the HF folder
    on disk (zero-egress environments fall back to self-distillation).
    """
    import json
    import os

    import jax
    import jax.numpy as jnp

    from deco_tpu.models.uniflow.vit import ViTConfig, VisionModel
    from deco_tpu.models.uniflow.components import resample_tokens
    from deco_tpu.models.uniflow.model import IMAGENET_MEAN, IMAGENET_STD

    dtype = dtype or jnp.bfloat16
    with open(os.path.join(model_dir, "config.json")) as f:
        cfg = json.load(f)
    vc = cfg.get("vision_config", cfg)
    vit_cfg = ViTConfig(
        hidden_size=vc.get("hidden_size", 1024),
        num_layers=vc.get("num_hidden_layers", 24),
        num_heads=vc.get("num_attention_heads", 16),
        intermediate_size=vc.get("intermediate_size", 4096),
        patch_size=vc.get("patch_size", 14),
        image_size=vc.get("image_size", 448),
        qkv_bias=vc.get("qkv_bias", True),
        qk_normalization=vc.get("qk_normalization", False),
        norm_type=vc.get("norm_type", "layer_norm"),
    )

    # host-side torch state dict load (bin or safetensors, possibly sharded)
    from deco_tpu.convert.torch_to_flax import load_torch_ckpt

    sd = {}
    files = sorted(
        f for f in os.listdir(model_dir)
        if f.endswith((".bin", ".safetensors", ".pt", ".ckpt"))
        and "training_args" not in f
    )
    if not files:
        raise FileNotFoundError(f"no checkpoint files in {model_dir}")
    for f in files:
        sd.update(load_torch_ckpt(os.path.join(model_dir, f)))
    vis = {k[len("vision_model."):]: v for k, v in sd.items()
           if k.startswith("vision_model.")}
    if not vis:  # bare InternVisionModel export
        vis = sd
    vit_params = vit_params_from_torch(vis, vit_cfg.num_layers,
                                       norm_type=vit_cfg.norm_type)
    mlp1 = {k[len("mlp1."):]: np.asarray(v) for k, v in sd.items()
            if k.startswith("mlp1.")}
    model = VisionModel(vit_cfg, dtype=dtype)

    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)

    def mlp1_apply(x):
        # HF mlp1 = Sequential(LayerNorm, Linear, GELU, Linear): keys 0/1/3
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        h = (xf - mu) / jnp.sqrt(var + 1e-5)
        h = h * jnp.asarray(mlp1["0.weight"]) + jnp.asarray(mlp1["0.bias"])
        h = h.astype(x.dtype)
        h = h @ jnp.asarray(mlp1["1.weight"]).T + jnp.asarray(mlp1["1.bias"])
        h = jax.nn.gelu(h, approximate=False)
        return h @ jnp.asarray(mlp1["3.weight"]).T + jnp.asarray(mlp1["3.bias"])

    @jax.jit
    def feature_fn(x):
        # x in [-1, 1] -> imagenet-normalized (the model's siglip _normalize)
        px = ((x * 0.5 + 0.5) - mean) / std
        hidden, _ = model.apply({"params": vit_params}, px.astype(dtype))
        embeds = hidden[:, 1:]
        embeds = resample_tokens(embeds, 0.5)
        return {"vit_embeds": embeds, "vit_embeds_mlp": mlp1_apply(embeds)}

    return feature_fn


def dinov2_params_from_torch(sd, num_layers: int = 12) -> dict:
    """torch-hub DINOv2 (dinov2_vitb14) state dict -> DINOv2 encoder params.

    Remaps the hub layout (``patch_embed.proj``, ``cls_token``, ``pos_embed``,
    ``blocks.{i}.{norm1,attn.qkv,attn.proj,ls1.gamma,mlp.fc1,...}``, final
    ``norm``) onto the InternViT-style :func:`vit_params_from_torch` layout
    (the architectures coincide: pre-norm ViT + LayerScale, exact GELU), and
    carries the final LayerNorm the reference feature extractor applies
    (``x_norm_patchtokens``, reference encoder_custom.py:44). Load the result
    into :class:`deco_tpu.models.encoders.DINOv2` via an npz with key
    ``params``.
    """
    g = lambda k: np.asarray(sd[k])
    remapped = {
        "embeddings.class_embedding": g("cls_token").reshape(1, 1, -1),
        "embeddings.position_embedding": g("pos_embed"),
        "embeddings.patch_embedding.weight": g("patch_embed.proj.weight"),
        "embeddings.patch_embedding.bias": g("patch_embed.proj.bias"),
    }
    for i in range(num_layers):
        src, dst = f"blocks.{i}.", f"encoder.layers.{i}."
        for a, b in (("attn.qkv.weight", "attn.qkv.weight"),
                     ("attn.qkv.bias", "attn.qkv.bias"),
                     ("attn.proj.weight", "attn.proj.weight"),
                     ("attn.proj.bias", "attn.proj.bias"),
                     ("mlp.fc1.weight", "mlp.fc1.weight"),
                     ("mlp.fc1.bias", "mlp.fc1.bias"),
                     ("mlp.fc2.weight", "mlp.fc2.weight"),
                     ("mlp.fc2.bias", "mlp.fc2.bias"),
                     ("norm1.weight", "norm1.weight"),
                     ("norm1.bias", "norm1.bias"),
                     ("norm2.weight", "norm2.weight"),
                     ("norm2.bias", "norm2.bias"),
                     ("ls1.gamma", "ls1"),
                     ("ls2.gamma", "ls2")):
            if src + a in sd:
                remapped[dst + b] = g(src + a)
    out = vit_params_from_torch(remapped, num_layers, norm_type="layer_norm")
    return {
        "params": out,
        "final_norm": {"scale": g("norm.weight"), "bias": g("norm.bias")},
    }
