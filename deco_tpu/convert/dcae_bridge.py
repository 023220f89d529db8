"""DC-AE torch -> Flax weight bridge.

Maps the reference's vendored-diffusers AutoencoderDC state dicts
(``src/models/uniflow/modeling_dcae.py:428-605`` — the decoder the VAE-GAN
and the UniFlow DCAE-variant pixel branch decode through, loaded from the
Sana-600M diffusers folder at ``modeling_uniflow_dcae.py:1166-1172`` /
``encoder_ae_sim.py:173-177``) onto :mod:`deco_tpu.models.dcae` params.

Layout notes (all verified by the parity pin in
tests/test_dcae_convert_parity.py against the vendored file run in-process):

- reference ``Decoder.up_blocks[i]`` is an ``nn.Sequential`` whose element 0
  is the ``DCUpBlock2d`` for every stage below the top (the top stage has
  blocks only); ours splits these into ``up_{i}`` + ``stage_{i}_block_{li}``.
- ``Encoder.down_blocks[i]`` appends its ``DCDownBlock2d`` LAST.
- block norms come from diffusers ``get_normalization`` (eps 1e-5, bias) —
  ``DCRMSNorm``; the attention q/k norms are ``RMSNorm(inner_dim, eps=1e-6)``
  without bias over the FLATTENED head dims.
- the depthwise ``conv_depth`` torch weight ``(2h, 1, 3, 3)`` transposes to
  the grouped-Conv HWIO kernel ``(3, 3, 1, 2h)`` like any conv.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

__all__ = [
    "dcae_params_from_torch",
    "dcae_decoder_params_from_torch",
    "dcae_encoder_params_from_torch",
]


def _conv(sd: Dict[str, np.ndarray], prefix: str, used: set,
          bias: bool = True) -> dict:
    k = np.asarray(sd[prefix + ".weight"], np.float32)
    out = {"kernel": np.ascontiguousarray(k.transpose(2, 3, 1, 0))}
    used.add(prefix + ".weight")
    if bias:
        out["bias"] = np.asarray(sd[prefix + ".bias"], np.float32)
        used.add(prefix + ".bias")
    return out


def _dense(sd, prefix, used, bias: bool = False) -> dict:
    out = {"kernel": np.ascontiguousarray(
        np.asarray(sd[prefix + ".weight"], np.float32).T)}
    used.add(prefix + ".weight")
    if bias:
        out["bias"] = np.asarray(sd[prefix + ".bias"], np.float32)
        used.add(prefix + ".bias")
    return out


def _norm(sd, prefix, used, bias: bool = True) -> dict:
    out = {"weight": np.asarray(sd[prefix + ".weight"], np.float32)}
    used.add(prefix + ".weight")
    if bias:
        out["bias"] = np.asarray(sd[prefix + ".bias"], np.float32)
        used.add(prefix + ".bias")
    return out


def _glumb(sd, prefix, used) -> dict:
    out = {
        "conv_inverted": _conv(sd, prefix + ".conv_inverted", used),
        "conv_depth": _conv(sd, prefix + ".conv_depth", used),
        "conv_point": _conv(sd, prefix + ".conv_point", used, bias=False),
    }
    if prefix + ".norm.weight" in sd:
        out["norm"] = _norm(sd, prefix + ".norm", used)
    return out


def _block(sd, prefix, used) -> dict:
    """One ResBlock or StandardAttentionBlock at ``prefix``."""
    if prefix + ".conv1.weight" in sd:  # ResBlock
        return {
            "conv1": _conv(sd, prefix + ".conv1", used),
            "conv2": _conv(sd, prefix + ".conv2", used, bias=False),
            "norm": _norm(sd, prefix + ".norm", used),
        }
    # StandardAttentionBlock (get_block builds it with qkv_bias=False)
    return {
        "qkv": _dense(sd, prefix + ".attn.qkv", used,
                      bias=prefix + ".attn.qkv.bias" in sd),
        "q_norm": _norm(sd, prefix + ".attn.q_norm", used, bias=False),
        "k_norm": _norm(sd, prefix + ".attn.k_norm", used, bias=False),
        "proj": _dense(sd, prefix + ".attn.proj", used),
        "norm_out": _norm(sd, prefix + ".attn.norm_out", used),
        "conv_out": _glumb(sd, prefix + ".conv_out", used),
    }


def _seq_indices(sd: Dict[str, np.ndarray], prefix: str) -> list:
    idx = set()
    for k in sd:
        if k.startswith(prefix + "."):
            rest = k[len(prefix) + 1:]
            head = rest.split(".", 1)[0]
            if head.isdigit():
                idx.add(int(head))
    return sorted(idx)


def dcae_decoder_params_from_torch(
        sd: Dict[str, np.ndarray], *, strict: bool = True) -> dict:
    """Bare ``Decoder`` state dict (keys ``conv_in.* up_blocks.*``, plus the
    diffusers head ``norm_out/conv_out`` when present) -> DCAEDecoder params."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    used: set = set()
    params = {"conv_in": _conv(sd, "conv_in", used)}
    stages = _seq_indices(sd, "up_blocks")
    num = max(stages) + 1 if stages else 0
    for i in stages:
        elems = _seq_indices(sd, f"up_blocks.{i}")
        li0 = 0
        if i < num - 1 and elems:
            # element 0 is the DCUpBlock2d (a bare `conv.`)
            if f"up_blocks.{i}.0.conv.weight" not in sd:
                raise ValueError(
                    f"up_blocks.{i}.0 is not a DCUpBlock2d — unsupported "
                    "layout (layers_per_block[i]==0 upstream?)")
            params[f"up_{i}"] = {
                "conv": _conv(sd, f"up_blocks.{i}.0.conv", used)}
            li0 = 1
            if len(elems) == 1:
                # an upsampler with zero blocks cannot come from the vendored
                # layout (both are gated on num_layers > 0) and the flax
                # decoder would silently skip it — refuse loudly
                raise ValueError(
                    f"up_blocks.{i} has an upsampler but no blocks — "
                    "unsupported layout")
        for j in elems[li0:]:
            params[f"stage_{i}_block_{j - li0}"] = _block(
                sd, f"up_blocks.{i}.{j}", used)
    if "norm_out.weight" in sd:  # diffusers head (absent in the vendored file)
        params["norm_out"] = _norm(sd, "norm_out", used)
        params["conv_out"] = _conv(sd, "conv_out", used)
    if strict:
        leftover = sorted(set(sd) - used)
        if leftover:
            raise ValueError(f"unconverted decoder keys: {leftover[:8]}")
    return params


def dcae_encoder_params_from_torch(
        sd: Dict[str, np.ndarray], *, strict: bool = True) -> dict:
    """Bare ``Encoder`` state dict -> DCAEEncoder params."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    used: set = set()
    if "conv_in.conv.weight" in sd:
        raise ValueError("layers_per_block[0]==0 encoder stem (DCDownBlock2d "
                         "conv_in) is not supported")
    params = {"conv_in": _conv(sd, "conv_in", used),
              "conv_out": _conv(sd, "conv_out", used)}
    stages = _seq_indices(sd, "down_blocks")
    num = max(stages) + 1 if stages else 0
    for i in stages:
        elems = _seq_indices(sd, f"down_blocks.{i}")
        # the downsampler (a bare `conv.`) is appended LAST, only when the
        # stage has blocks — detect it rather than assume
        has_down = bool(elems) and (
            f"down_blocks.{i}.{elems[-1]}.conv.weight" in sd
            and f"down_blocks.{i}.{elems[-1]}.conv1.weight" not in sd
            and f"down_blocks.{i}.{elems[-1]}.attn.qkv.weight" not in sd)
        n_blocks = len(elems) - (1 if has_down else 0)
        for j in range(n_blocks):
            params[f"stage_{i}_block_{j}"] = _block(
                sd, f"down_blocks.{i}.{j}", used)
        if has_down:
            if i >= num - 1:
                raise ValueError(
                    f"down_blocks.{i} carries a downsampler at the top stage")
            params[f"down_{i}"] = {
                "conv": _conv(sd, f"down_blocks.{i}.{n_blocks}.conv", used)}
    if strict:
        leftover = sorted(set(sd) - used)
        if leftover:
            raise ValueError(f"unconverted encoder keys: {leftover[:8]}")
    return params


def dcae_params_from_torch(sd: Dict[str, np.ndarray]) -> dict:
    """Full AutoencoderDC state dict (``encoder.`` + ``decoder.`` scoped)
    -> params for :class:`deco_tpu.models.dcae.AutoencoderDC`."""
    enc = {k[len("encoder."):]: v for k, v in sd.items()
           if k.startswith("encoder.")}
    dec = {k[len("decoder."):]: v for k, v in sd.items()
           if k.startswith("decoder.")}
    if not enc or not dec:
        raise ValueError("expected encoder.* and decoder.* scoped keys")
    return {"encoder": dcae_encoder_params_from_torch(enc),
            "decoder": dcae_decoder_params_from_torch(dec)}


def infer_dcae_stage_config(sd: Dict[str, np.ndarray], blocks_key: str):
    """Infer (block_out_channels, layers_per_block, attention_stages) from a
    bare Encoder/Decoder state dict — block geometry is fully determined by
    the conv shapes, so loading a published Sana DC-AE needs no config.json.

    ``blocks_key`` is ``"down_blocks"`` or ``"up_blocks"``. Structural (not
    weight-bearing) choice ``attention_head_dim`` cannot be inferred (the qkv
    projection is square) and stays the diffusers default upstream."""
    stages = _seq_indices(sd, blocks_key)
    num = max(stages) + 1 if stages else 0
    channels, layers, attn = [], [], []
    for i in range(num):
        elems = _seq_indices(sd, f"{blocks_key}.{i}")
        # a stage Sequential holds blocks + (optionally) one up/down block
        # whose only child is a bare `conv.`
        def _is_updown(j):
            return (f"{blocks_key}.{i}.{j}.conv.weight" in sd
                    and f"{blocks_key}.{i}.{j}.conv1.weight" not in sd
                    and f"{blocks_key}.{i}.{j}.attn.qkv.weight" not in sd)

        block_elems = [j for j in elems if not _is_updown(j)]
        layers.append(len(block_elems))
        if not block_elems:
            channels.append(0)
            attn.append(False)
            continue
        j0 = block_elems[0]
        if f"{blocks_key}.{i}.{j0}.conv1.weight" in sd:
            channels.append(
                int(np.asarray(sd[f"{blocks_key}.{i}.{j0}.conv1.weight"])
                    .shape[0]))
            attn.append(False)
        else:
            channels.append(
                int(np.asarray(sd[f"{blocks_key}.{i}.{j0}.attn.qkv.weight"])
                    .shape[1]))
            attn.append(True)
    return tuple(channels), tuple(layers), tuple(attn)


def dcae_flax_from_torch(sd: Dict[str, np.ndarray], *, dtype=None,
                         attention_head_dim: int = 32):
    """Full AutoencoderDC state dict -> (flax module, params) with the stage
    geometry inferred from the weights. The decoder head (norm_out/conv_out)
    is detected from the keys (present in diffusers checkpoints, absent in
    the reference's vendored headless decoder)."""
    import jax.numpy as jnp

    from deco_tpu.models.dcae import AutoencoderDC

    enc = {k[len("encoder."):]: np.asarray(v) for k, v in sd.items()
           if k.startswith("encoder.")}
    dec = {k[len("decoder."):]: np.asarray(v) for k, v in sd.items()
           if k.startswith("decoder.")}
    e_ch, e_layers, e_attn = infer_dcae_stage_config(enc, "down_blocks")
    d_ch, d_layers, d_attn = infer_dcae_stage_config(dec, "up_blocks")
    latent = int(enc["conv_out.weight"].shape[0])
    model = AutoencoderDC(
        latent_channels=latent, dtype=dtype or jnp.float32,
        encoder_block_out_channels=e_ch, encoder_layers_per_block=e_layers,
        encoder_attention_stages=e_attn,
        decoder_block_out_channels=d_ch, decoder_layers_per_block=d_layers,
        decoder_attention_stages=d_attn,
        attention_head_dim=attention_head_dim,
        decoder_head="norm_out.weight" in dec,
    )
    params = {"encoder": dcae_encoder_params_from_torch(enc),
              "decoder": dcae_decoder_params_from_torch(dec)}
    return model, params
