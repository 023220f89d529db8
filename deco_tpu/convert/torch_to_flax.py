"""One-shot PyTorch -> Flax checkpoint converter for DeCo checkpoints.

Handles the reference's exact prefix conventions (SURVEY §5 checkpoint/resume:
``denoiser.`` / ``ema_denoiser.`` / ``model.`` / ``ema_model.`` / ``.module.``
(DDP) / ``._orig_mod.`` (torch.compile) — ``src/utils/model_loader.py:10-26``,
``src/lightning_model.py:333-350`` of hhhhzp/DeCo) and the layout mapping
between torch and deco_tpu:

- ``nn.Linear`` weight (out, in) -> Dense kernel (in, out) (transpose);
- the patch-embed input ordering: torch ``unfold`` flattens patches
  channel-major (c, py, px) while deco_tpu patchify is pixel-major
  (py, px, c) — the ``s_embedder``/``x_embedder``(baseline) kernel rows are
  permuted accordingly;
- per-layer block weights are stacked along axis 0 to match ``nn.scan``
  parameter trees.

Input is a numpy state dict: ``{name: np.ndarray}``. Use :func:`load_torch_ckpt`
to read ``.ckpt``/``.pt``/``.safetensors`` files (torch CPU is available in the
toolchain for exactly this interop path; no torch is used at runtime).
"""

from __future__ import annotations

import re
from typing import Dict, Optional

import numpy as np

PREFIXES = ("denoiser.", "ema_denoiser.", "model.", "ema_model.")
SCRUB = (".module.", "._orig_mod.")


def load_torch_ckpt(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint file into a numpy state dict."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: v.detach().cpu().float().numpy() for k, v in obj.items()
            if hasattr(v, "detach")}


def clean_key(key: str) -> str:
    """Scrub DDP/torch.compile prefixes anywhere in the name."""
    for s in SCRUB:
        key = key.replace(s, ".")
    for s in ("module.", "_orig_mod."):
        while key.startswith(s):
            key = key[len(s):]
    return key


def select_prefix(state: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    """Pick the ``prefix``-scoped sub-dict (e.g. 'ema_denoiser.')."""
    out = {}
    for k, v in state.items():
        k = clean_key(k)
        if k.startswith(prefix):
            out[k[len(prefix):]] = v
    return out


def _t(w):  # torch Linear weight -> Dense kernel
    return np.ascontiguousarray(w.T)


def _unfold_perm(w, in_channels: int, patch_size: int):
    """Permute embed kernel rows from unfold (c,py,px) to patchify (py,px,c)."""
    out_dim = w.shape[0]
    p2 = patch_size * patch_size
    wr = w.reshape(out_dim, in_channels, p2)  # (out, c, p2)
    wr = np.transpose(wr, (2, 1, 0))  # (p2, c, out)
    return np.ascontiguousarray(wr.reshape(p2 * in_channels, out_dim))


def _pixel_major_perm(in_channels: int, patch_size: int) -> np.ndarray:
    """Index map: pixel-major position (u*C + c) -> unfold position (c*p2 + u)."""
    p2 = patch_size * patch_size
    return np.asarray(
        [c * p2 + u for u in range(p2) for c in range(in_channels)]
    )


def _set(tree: dict, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = np.asarray(value)


def _stack_blocks(entries: Dict[int, dict]) -> dict:
    """Stack per-layer param dicts {i: tree} into one tree with a leading axis."""
    idxs = sorted(entries)
    out: dict = {}

    def rec(trees, path):
        keys = trees[0].keys()
        for k in keys:
            vals = [t[k] for t in trees]
            if isinstance(vals[0], dict):
                rec(vals, path + [k])
            else:
                _set(out, path + [k], np.stack(vals, axis=0))

    rec([entries[i] for i in idxs], [])
    return out


def _convert_swiglu(prefix: str, sd: Dict[str, np.ndarray]) -> dict:
    """SwiGLU weights in either layout:

    - split (dit_c2i_DeCo.py FeedForward): w1/w3 inputs, w2 output;
    - fused (src/models/layers/swiglu.py): w12 = [w1; gate], and the
      reference's `w3` is the OUTPUT projection (maps to deco_tpu w2).
    """
    if prefix + "mlp.w1.weight" in sd:
        return {
            "w1": {"kernel": _t(sd[prefix + "mlp.w1.weight"])},
            "w3": {"kernel": _t(sd[prefix + "mlp.w3.weight"])},
            "w2": {"kernel": _t(sd[prefix + "mlp.w2.weight"])},
        }
    w12 = sd[prefix + "mlp.w12.weight"]
    half = w12.shape[0] // 2
    return {
        "w1": {"kernel": _t(w12[:half])},
        "w3": {"kernel": _t(w12[half:])},
        "w2": {"kernel": _t(sd[prefix + "mlp.w3.weight"])},
    }


def _convert_dit_block(prefix: str, sd: Dict[str, np.ndarray]) -> dict:
    """One FlattenDiTBlock / JointDiTBlock / TextRefineBlock."""
    g = lambda n: sd[prefix + n]
    block: dict = {
        "adaLN_modulation": {
            "kernel": _t(g("adaLN_modulation.0.weight")),
            "bias": g("adaLN_modulation.0.bias"),
        },
        "norm1": {"weight": g("norm1.weight")},
        "norm2": {"weight": g("norm2.weight")},
        "mlp": _convert_swiglu(prefix, sd),
    }
    attn: dict = {}
    if prefix + "attn.qkv.weight" in sd:  # self-attention (c2i / text-refine)
        attn["qkv"] = {"kernel": _t(g("attn.qkv.weight"))}
        if prefix + "attn.qkv.bias" in sd:
            attn["qkv"]["bias"] = g("attn.qkv.bias")
    else:  # joint attention (t2i)
        attn["qkv_x"] = {"kernel": _t(g("attn.qkv_x.weight"))}
        attn["kv_y"] = {"kernel": _t(g("attn.kv_y.weight"))}
    attn["q_norm"] = {"weight": g("attn.q_norm.weight")}
    attn["k_norm"] = {"weight": g("attn.k_norm.weight")}
    attn["proj"] = {"kernel": _t(g("attn.proj.weight")), "bias": g("attn.proj.bias")}
    block["attn"] = attn
    return block


def _convert_text_refine_block(prefix: str, sd: Dict[str, np.ndarray]) -> dict:
    g = lambda n: sd[prefix + n]
    return {
        "adaLN_modulation": {
            "kernel": _t(g("adaLN_modulation.0.weight")),
            "bias": g("adaLN_modulation.0.bias"),
        },
        "norm1": {"weight": g("norm1.weight")},
        "norm2": {"weight": g("norm2.weight")},
        "attn_qkv": {"kernel": _t(g("attn.qkv.weight"))},
        "attn_q_norm": {"weight": g("attn.q_norm.weight")},
        "attn_k_norm": {"weight": g("attn.k_norm.weight")},
        "attn_proj": {
            "kernel": _t(g("attn.proj.weight")),
            "bias": g("attn.proj.bias"),
        },
        "mlp": _convert_swiglu(prefix, sd),
    }


def _convert_simple_mlp_adaln(prefix: str, sd: Dict[str, np.ndarray]) -> dict:
    g = lambda n: sd[prefix + n]
    dec: dict = {
        "input_proj": {"kernel": _t(g("input_proj.weight")),
                       "bias": g("input_proj.bias")},
        "cond_embed": {"kernel": _t(g("cond_embed.weight")),
                       "bias": g("cond_embed.bias")},
        "final_linear": {"kernel": _t(g("final_layer.linear.weight")),
                         "bias": g("final_layer.linear.bias")},
    }
    i = 0
    while f"{prefix}res_blocks.{i}.in_ln.weight" in sd:
        rb = f"{prefix}res_blocks.{i}."
        dec[f"res_blocks_{i}"] = {
            "in_ln": {"scale": sd[rb + "in_ln.weight"],
                      "bias": sd[rb + "in_ln.bias"]},
            "mlp_0": {"kernel": _t(sd[rb + "mlp.0.weight"]),
                      "bias": sd[rb + "mlp.0.bias"]},
            "mlp_2": {"kernel": _t(sd[rb + "mlp.2.weight"]),
                      "bias": sd[rb + "mlp.2.bias"]},
            "adaLN_modulation": {"kernel": _t(sd[rb + "adaLN_modulation.1.weight"]),
                                 "bias": sd[rb + "adaLN_modulation.1.bias"]},
        }
        i += 1
    return dec


def convert_deco_c2i(
    sd: Dict[str, np.ndarray],
    in_channels: int = 3,
    patch_size: int = 16,
    num_cond_blocks: Optional[int] = None,
) -> dict:
    """Convert a reference dit_c2i_DeCo.PixNerDiT state dict to DeCoC2I params."""
    sd = {clean_key(k): v for k, v in sd.items()}
    if num_cond_blocks is None:
        idxs = {int(m.group(1)) for k in sd
                if (m := re.match(r"blocks\.(\d+)\.", k))}
        if not idxs:
            raise ValueError(
                "no blocks.N.* keys found — not a DeCo c2i state dict "
                "(check --model / --prefix; sample keys: "
                f"{sorted(sd)[:3]})"
            )
        num_cond_blocks = max(idxs) + 1
    params: dict = {
        "s_embedder": {
            "proj": {
                "kernel": _unfold_perm(sd["s_embedder.proj.weight"], in_channels,
                                       patch_size),
                "bias": sd["s_embedder.proj.bias"],
            }
        },
        "t_embedder": {
            "mlp_0": {"kernel": _t(sd["t_embedder.mlp.0.weight"]),
                      "bias": sd["t_embedder.mlp.0.bias"]},
            "mlp_2": {"kernel": _t(sd["t_embedder.mlp.2.weight"]),
                      "bias": sd["t_embedder.mlp.2.bias"]},
        },
        "y_embedder": {"embedding": sd["y_embedder.embedding_table.weight"]},
        "x_embedder": {
            "embedder": {"kernel": _t(sd["x_embedder.embedder.0.weight"]),
                         "bias": sd["x_embedder.embedder.0.bias"]},
        },
        "blocks": {"block": {}},
        "dec_net": _convert_simple_mlp_adaln("dec_net.", sd),
    }
    blocks = {
        i: _convert_dit_block(f"blocks.{i}.", sd) for i in range(num_cond_blocks)
    }
    params["blocks"]["block"] = _stack_blocks(blocks)
    return params


def convert_baseline_dit(
    sd: Dict[str, np.ndarray],
    in_channels: int = 3,
    patch_size: int = 16,
    num_blocks: Optional[int] = None,
) -> dict:
    """Convert a reference dit_c2i_baseline.FlattenDiT state dict."""
    sd = {clean_key(k): v for k, v in sd.items()}
    if num_blocks is None:
        idxs = {int(m.group(1)) for k in sd
                if (m := re.match(r"blocks\.(\d+)\.", k))}
        num_blocks = max(idxs) + 1
    params: dict = {
        "x_embedder": {
            "proj": {
                "kernel": _unfold_perm(sd["x_embedder.proj.weight"], in_channels,
                                       patch_size),
                "bias": sd["x_embedder.proj.bias"],
            }
        },
        "t_embedder": {
            "mlp_0": {"kernel": _t(sd["t_embedder.mlp.0.weight"]),
                      "bias": sd["t_embedder.mlp.0.bias"]},
            "mlp_2": {"kernel": _t(sd["t_embedder.mlp.2.weight"]),
                      "bias": sd["t_embedder.mlp.2.bias"]},
        },
        "y_embedder": {"embedding": sd["y_embedder.embedding_table.weight"]},
        "blocks": {"block": _stack_blocks({
            i: _convert_dit_block(f"blocks.{i}.", sd) for i in range(num_blocks)
        })},
        "final_layer": {
            "adaLN_modulation": {
                "kernel": _t(sd["final_layer.adaLN_modulation.0.weight"]),
                "bias": sd["final_layer.adaLN_modulation.0.bias"],
            },
            # output is patch pixels: permute the linear's OUTPUT dim from the
            # unfold (c, py, px) order to the pixel-major (py, px, c) layout
            "linear": {
                "kernel": _t(sd["final_layer.linear.weight"])[
                    :, _pixel_major_perm(in_channels, patch_size)
                ],
                "bias": sd["final_layer.linear.bias"][
                    _pixel_major_perm(in_channels, patch_size)
                ],
            },
        },
    }
    return params


def convert_pixnerd_c2i(
    sd: Dict[str, np.ndarray],
    in_channels: int = 3,
    patch_size: int = 16,
    num_cond_blocks: Optional[int] = None,
) -> dict:
    """Convert a reference dit_c2i_pixnerd.PixNerDiT state dict."""
    sd = {clean_key(k): v for k, v in sd.items()}
    if num_cond_blocks is None:
        idxs = {int(m.group(1)) for k in sd
                if (m := re.match(r"blocks\.(\d+)\.norm1", k))}
        num_cond_blocks = max(idxs) + 1
    params = {
        "s_embedder": {
            "proj": {
                "kernel": _unfold_perm(sd["s_embedder.proj.weight"], in_channels,
                                       patch_size),
                "bias": sd["s_embedder.proj.bias"],
            }
        },
        "t_embedder": {
            "mlp_0": {"kernel": _t(sd["t_embedder.mlp.0.weight"]),
                      "bias": sd["t_embedder.mlp.0.bias"]},
            "mlp_2": {"kernel": _t(sd["t_embedder.mlp.2.weight"]),
                      "bias": sd["t_embedder.mlp.2.bias"]},
        },
        "y_embedder": {"embedding": sd["y_embedder.embedding_table.weight"]},
        "x_embedder": {
            "embedder": {"kernel": _t(sd["x_embedder.embedder.0.weight"]),
                         "bias": sd["x_embedder.embedder.0.bias"]},
        },
        "blocks": {"block": _stack_blocks({
            i: _convert_dit_block(f"blocks.{i}.", sd)
            for i in range(num_cond_blocks)
        })},
        "final_norm": {"weight": sd["final_layer.norm.weight"]},
        "final_linear": {"kernel": _t(sd["final_layer.linear.weight"]),
                         "bias": sd["final_layer.linear.bias"]},
    }
    i = 0
    while f"blocks.{num_cond_blocks + i}.param_generator1.0.weight" in sd:
        nb = f"blocks.{num_cond_blocks + i}."
        params[f"nerf_blocks_{i}"] = {
            "param_generator1": {
                "kernel": _t(sd[nb + "param_generator1.0.weight"]),
                "bias": sd[nb + "param_generator1.0.bias"],
            },
            "norm": {"weight": sd[nb + "norm.weight"]},
        }
        i += 1
    return params


def convert_deco_t2i(
    sd: Dict[str, np.ndarray],
    in_channels: int = 3,
    patch_size: int = 16,
    num_encoder_blocks: int = 16,
    num_text_blocks: int = 4,
    pixnerd: bool = False,
) -> dict:
    """Convert a t2i (PixNerd trunk) state dict to DeCoT2I/PixNerdT2I params."""
    sd = {clean_key(k): v for k, v in sd.items()}
    trunk: dict = {
        "s_embedder": {
            "proj": {
                "kernel": _unfold_perm(sd["s_embedder.proj.weight"], in_channels,
                                       patch_size),
                "bias": sd["s_embedder.proj.bias"],
            }
        },
        "t_embedder": {
            "mlp_0": {"kernel": _t(sd["t_embedder.mlp.0.weight"]),
                      "bias": sd["t_embedder.mlp.0.bias"]},
            "mlp_2": {"kernel": _t(sd["t_embedder.mlp.2.weight"]),
                      "bias": sd["t_embedder.mlp.2.bias"]},
        },
        "y_embedder": {
            "proj": {"kernel": _t(sd["y_embedder.proj.weight"]),
                     "bias": sd["y_embedder.proj.bias"]},
            "norm": {"weight": sd["y_embedder.norm.weight"]},
        },
        "y_pos_embedding": sd["y_pos_embedding"],
        "text_refine_blocks": {"block": _stack_blocks({
            i: _convert_text_refine_block(f"text_refine_blocks.{i}.", sd)
            for i in range(num_text_blocks)
        })},
        "blocks": {"block": _stack_blocks({
            i: _convert_dit_block(f"blocks.{i}.", sd)
            for i in range(num_encoder_blocks)
        })},
    }
    params: dict = {"trunk": trunk, "x_embedder": {
        "embedder": {"kernel": _t(sd["x_embedder.embedder.0.weight"]),
                     "bias": sd["x_embedder.embedder.0.bias"]},
    }}
    if pixnerd:
        i = 0
        while f"blocks.{num_encoder_blocks + i}.param_generator1.0.weight" in sd:
            nb = f"blocks.{num_encoder_blocks + i}."
            params[f"nerf_blocks_{i}"] = {
                "param_generator1": {
                    "kernel": _t(sd[nb + "param_generator1.0.weight"]),
                    "bias": sd[nb + "param_generator1.0.bias"],
                },
                "norm": {"weight": sd[nb + "norm.weight"]},
            }
            i += 1
        params["final_linear"] = {
            "kernel": _t(sd["final_layer.linear.weight"]),
            "bias": sd["final_layer.linear.bias"],
        }
    else:
        params["dec_net"] = _convert_simple_mlp_adaln("dec_net.", sd)
    return params


def convert_denoiser_ckpt(
    path: str,
    model_kind: str = "deco_c2i",
    use_ema: bool = True,
    **kwargs,
) -> dict:
    """End-to-end: load torch ckpt, pick (ema_)denoiser prefix, convert.

    Mirrors the reference's ModelLoader + app.py loading path
    (model_loader.py:10-26, app.py:56-63).
    """
    raw = load_torch_ckpt(path)
    prefix = "ema_denoiser." if use_ema else "denoiser."
    sd = select_prefix(raw, prefix)
    if not sd:  # bare state dict without the Lightning prefix
        sd = {clean_key(k): v for k, v in raw.items()}
    if model_kind == "deco_c2i":
        return convert_deco_c2i(sd, **kwargs)
    if model_kind == "deco_t2i":
        return convert_deco_t2i(sd, **kwargs)
    if model_kind == "pixnerd_t2i":
        return convert_deco_t2i(sd, pixnerd=True, **kwargs)
    raise ValueError(model_kind)


def _vision_tower_and_mlp1(sd: Dict[str, np.ndarray],
                           norm_type: str = "auto") -> dict:
    """Shared encoder mapping for reference models built as
    ``vision_model`` (InternViT) + ``mlp1`` Sequential(LN, Linear, GELU,
    Linear): ReCo (dit_t2i_DeCo.py:508-526) and the VAE encoders
    (encoder_ae_sim.py:123-139)."""
    from deco_tpu.convert.vit_bridge import vit_params_from_torch

    vit_sd = {k[len("vision_model."):]: v for k, v in sd.items()
              if k.startswith("vision_model.")}
    n_vit = 1 + max(int(m.group(1)) for k in vit_sd
                    if (m := re.match(r"encoder\.layers\.(\d+)\.", k)))
    if norm_type == "auto":
        norm_type = ("layer_norm" if "encoder.layers.0.norm1.bias" in vit_sd
                     else "rms_norm")
    return {
        "vision_model": vit_params_from_torch(vit_sd, n_vit,
                                              norm_type=norm_type),
        "mlp1_norm": {"scale": sd["mlp1.0.weight"], "bias": sd["mlp1.0.bias"]},
        "mlp1_fc1": {"kernel": _t(sd["mlp1.1.weight"]),
                     "bias": sd["mlp1.1.bias"]},
        "mlp1_fc2": {"kernel": _t(sd["mlp1.3.weight"]),
                     "bias": sd["mlp1.3.bias"]},
    }


def convert_reco(sd: Dict[str, np.ndarray], norm_type: str = "auto") -> dict:
    """Reference ``dit_t2i_DeCo.PixNerDiT`` (the snapshot's ReCo class,
    dit_t2i_DeCo.py:469-633) state dict -> :class:`models.reco.ReCoModel`
    params: frozen InternViT tower (via the ViT bridge), mlp1 connector,
    latent projector, and the PixelDecoder (learnable tokens, plain DiT
    blocks with fused-SwiGLU, t2i NerfEmbedder, SimpleMLPAdaLN dec_net)."""
    from deco_tpu.convert.uniflow_bridge import _dit_block

    sd = {clean_key(k): np.asarray(v) for k, v in sd.items()}
    params: dict = _vision_tower_and_mlp1(sd, norm_type)
    params.update({
        "latent_fc1": {"kernel": _t(sd["latent_projector.0.weight"]),
                       "bias": sd["latent_projector.0.bias"]},
        "latent_fc2": {"kernel": _t(sd["latent_projector.2.weight"]),
                       "bias": sd["latent_projector.2.bias"]},
    })
    pd = "pixel_decoder."
    dec: dict = {
        "learnable_tokens": sd[pd + "learnable_tokens"],
        "s_embedder": {"proj": {
            "kernel": _t(sd[pd + "s_embedder.proj.weight"]),
            "bias": sd[pd + "s_embedder.proj.bias"]}},
        "x_embedder": {"embedder": {
            "kernel": _t(sd[pd + "x_embedder.embedder.0.weight"]),
            "bias": sd[pd + "x_embedder.embedder.0.bias"]}},
        "t_embedder": {
            "mlp_0": {"kernel": _t(sd[pd + "t_embedder.mlp.0.weight"]),
                      "bias": sd[pd + "t_embedder.mlp.0.bias"]},
            "mlp_2": {"kernel": _t(sd[pd + "t_embedder.mlp.2.weight"]),
                      "bias": sd[pd + "t_embedder.mlp.2.bias"]},
        },
        "dec_net": _convert_simple_mlp_adaln(pd + "dec_net.", sd),
    }
    n_blocks = 1 + max(int(m.group(1)) for k in sd
                       if (m := re.match(r"pixel_decoder\.blocks\.(\d+)\.", k)))
    for i in range(n_blocks):
        dec[f"blocks_{i}"] = _dit_block(sd, f"{pd}blocks.{i}.")
    params["pixel_decoder"] = dec
    return params


def convert_discriminator(sd: Dict[str, np.ndarray]) -> dict:
    """Reference ``NLayerDiscriminator`` (src/models/modules/discriminator.py:73-154)
    state dict -> :class:`models.gan.discriminator.NLayerDiscriminator` params
    (same-pad convs OIHW->HWIO, per-stage GroupNorm)."""
    sd = {clean_key(k): np.asarray(v) for k, v in sd.items()}

    def conv(name):
        return {"conv": {
            "kernel": np.ascontiguousarray(
                sd[name + ".weight"].transpose(2, 3, 1, 0)),
            "bias": sd[name + ".bias"],
        }}

    params = {
        "block_in": conv("block_in.0"),
        "head_conv1": conv("to_logits.0"),
        "head_conv2": conv("to_logits.2"),
    }
    i = 0
    while f"blocks.{i}.0.weight" in sd:
        params[f"stage_{i}_conv"] = conv(f"blocks.{i}.0")
        params[f"stage_{i}_norm"] = {"scale": sd[f"blocks.{i}.2.weight"],
                                     "bias": sd[f"blocks.{i}.2.bias"]}
        i += 1
    return params


def convert_vae_encoder(sd: Dict[str, np.ndarray],
                        norm_type: str = "auto") -> dict:
    """Reference ``encoder_ae_sim.VAEModel`` / ``encoder_ae.VAEModel``
    ENCODER-side state dict -> :class:`models.vae_models.VAEModel` params
    (vision tower via the ViT bridge, mlp1, gen_mlp1 DCDownsampleMLP,
    LatentConnectorModule). Decoder (vendored diffusers DC-AE) keys are
    ignored — load DC-AE weights through ``models.dcae``'s own bridge."""
    sd = {clean_key(k): np.asarray(v) for k, v in sd.items()}
    params: dict = _vision_tower_and_mlp1(sd, norm_type)
    params.update({
        "gen_mlp1": {
            "channel_proj": {"kernel": _t(sd["gen_mlp1.channel_proj.weight"]),
                             "bias": sd["gen_mlp1.channel_proj.bias"]},
            "mlp_norm": {"scale": sd["gen_mlp1.mlp.0.weight"],
                         "bias": sd["gen_mlp1.mlp.0.bias"]},
            "mlp_fc1": {"kernel": _t(sd["gen_mlp1.mlp.1.weight"]),
                        "bias": sd["gen_mlp1.mlp.1.bias"]},
            "mlp_fc2": {"kernel": _t(sd["gen_mlp1.mlp.3.weight"]),
                        "bias": sd["gen_mlp1.mlp.3.bias"]},
        },
    })
    lp: dict = {}
    for i in range(3):
        pre = f"latent_projector.mlp_blocks.{i}."
        lp[f"mlp_blocks_{i}"] = {
            "norm": {"weight": sd[pre + "norm.weight"]},
            "fc1": {"kernel": _t(sd[pre + "mlp.0.weight"]),
                    "bias": sd[pre + "mlp.0.bias"]},
            "fc2": {"kernel": _t(sd[pre + "mlp.2.weight"]),
                    "bias": sd[pre + "mlp.2.bias"]},
        }
    if "latent_projector.final_proj.weight" in sd:
        lp["final_proj"] = {
            "kernel": _t(sd["latent_projector.final_proj.weight"]),
            "bias": sd["latent_projector.final_proj.bias"]}
    params["latent_projector"] = lp
    return params
