"""Checkpoint conversion CLI: reference torch <-> deco_tpu flax.

CLI surface for the reference's conversion scripts (``load_vlm.py``,
``scripts/convert_vae_to_internvl.py`` of hhhhzp/DeCo) plus the reverse
direction the reference lacks:

    # published torch checkpoint -> flax params (msgpack)
    python -m deco_tpu.convert import-torch ckpt.pt out.msgpack \\
        --model c2i [--prefix ema_denoiser.] [--patch-size 16]

    # trained flax params -> reference-layout torch checkpoint
    python -m deco_tpu.convert export-torch params.msgpack out.pt --model c2i

    # uniflow lightning checkpoint (model./ema_model.) -> flax and back
    python -m deco_tpu.convert import-torch ckpt.pt out.msgpack --model uniflow
    python -m deco_tpu.convert export-torch params.msgpack out.pt --model uniflow

Flax params travel as flax.serialization msgpack bytes (framework-native,
no pickle).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def _load_torch(path: str):
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt

    def _np(v):
        # reference VAE checkpoints carry bf16 DC-AE weights, which numpy
        # cannot convert directly
        if isinstance(v, torch.Tensor) and v.dtype == torch.bfloat16:
            v = v.float()
        return np.asarray(v)

    return {k: _np(v) for k, v in sd.items()
            if hasattr(v, "shape") or np.isscalar(v)}


def _save_msgpack(tree: dict, path: str):
    from flax import serialization

    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(tree))


def _load_msgpack(path: str) -> dict:
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def main(argv=None):
    parser = argparse.ArgumentParser(prog="python -m deco_tpu.convert")
    sub = parser.add_subparsers(dest="cmd", required=True)

    imp = sub.add_parser("import-torch", help="torch state dict -> flax params")
    imp.add_argument("src")
    imp.add_argument("dst")
    imp.add_argument("--model", required=True,
                     choices=["c2i", "t2i", "uniflow", "vit", "dinov2",
                              "reco", "discriminator", "vae_encoder"])
    imp.add_argument("--prefix", default="denoiser.",
                     help="key namespace for c2i/t2i/reco lightning ckpts "
                          "(denoiser. or ema_denoiser.)")
    imp.add_argument("--ema", action="store_true",
                     help="uniflow: select ema_model.; vae_encoder: select "
                          "ema_vae_model. (the reference's inference copy)")
    imp.add_argument("--in-channels", type=int, default=3)
    imp.add_argument("--patch-size", type=int, default=16)
    imp.add_argument("--num-layers", type=int, default=24,
                     help="vit: encoder depth")

    exp = sub.add_parser("export-torch", help="flax params -> torch state dict")
    exp.add_argument("src")
    exp.add_argument("dst")
    exp.add_argument("--model", required=True,
                     choices=["c2i", "t2i", "uniflow", "vit"])
    exp.add_argument("--ema-src", default=None,
                     help="optional second msgpack exported as ema_denoiser.*")
    exp.add_argument("--in-channels", type=int, default=3)
    exp.add_argument("--patch-size", type=int, default=16)

    args = parser.parse_args(argv)

    if args.cmd == "import-torch":
        sd = _load_torch(args.src)
        if args.model == "c2i":
            from deco_tpu.convert.torch_to_flax import convert_deco_c2i, select_prefix

            sd = select_prefix(sd, args.prefix) or sd
            params = convert_deco_c2i(sd, in_channels=args.in_channels,
                                      patch_size=args.patch_size)
        elif args.model == "t2i":
            from deco_tpu.convert.torch_to_flax import convert_deco_t2i, select_prefix

            sd = select_prefix(sd, args.prefix) or sd
            params = convert_deco_t2i(sd, in_channels=args.in_channels,
                                      patch_size=args.patch_size)
        elif args.model == "uniflow":
            from deco_tpu.convert.uniflow_bridge import uniflow_params_from_torch

            params = uniflow_params_from_torch(sd, use_ema=args.ema)
        elif args.model == "reco":
            from deco_tpu.convert.torch_to_flax import convert_reco, select_prefix

            sd = select_prefix(sd, args.prefix) or sd
            params = convert_reco(sd)
        elif args.model == "discriminator":
            from deco_tpu.convert.torch_to_flax import convert_discriminator, select_prefix

            # VAE-GAN lightning checkpoints nest it under loss_module.
            sd = (select_prefix(sd, "loss_module.discriminator.")
                  or select_prefix(sd, "discriminator.") or sd)
            params = convert_discriminator(sd)
        elif args.model == "vae_encoder":
            from deco_tpu.convert.torch_to_flax import convert_vae_encoder, select_prefix

            # reference treats the EMA copy as the real inference weights
            # (lightning_model_ae load_ema_as_main)
            want = "ema_vae_model." if args.ema else "vae_model."
            sd = select_prefix(sd, want) or sd
            params = convert_vae_encoder(sd)
        elif args.model == "dinov2":
            # torch-hub dinov2_vitb14 layout -> npz for encoders.DINOv2
            from deco_tpu.convert.vit_bridge import dinov2_params_from_torch

            params = dinov2_params_from_torch(sd, num_layers=args.num_layers)
            if args.dst.endswith(".npz"):
                np.savez(args.dst, params=params)
                n = sum(int(np.prod(np.shape(l))) for l in _leaves(params))
                print(f"wrote {args.dst}: {n/1e6:.1f}M params (dinov2 npz)")
                return
        else:
            from deco_tpu.convert.vit_bridge import vit_params_from_torch

            params = vit_params_from_torch(sd, num_layers=args.num_layers)
        _save_msgpack(params, args.dst)
        n = sum(int(np.prod(np.shape(l))) for l in _leaves(params))
        print(f"wrote {args.dst}: {n/1e6:.1f}M params ({args.model})")
    else:
        params = _load_msgpack(args.src)
        from deco_tpu.convert.flax_to_torch import save_torch_checkpoint

        if args.model in ("c2i", "t2i"):
            from deco_tpu.convert.flax_to_torch import export_checkpoint

            ema = _load_msgpack(args.ema_src) if args.ema_src else None
            sd = export_checkpoint(
                params, ema, model_kind=f"deco_{args.model}",
                in_channels=args.in_channels, patch_size=args.patch_size,
            )
        elif args.model == "uniflow":
            from deco_tpu.convert.uniflow_bridge import uniflow_params_to_torch

            sd = uniflow_params_to_torch(params)
        else:
            from deco_tpu.convert.vit_bridge import vit_params_to_torch

            sd = vit_params_to_torch(params)
        save_torch_checkpoint(sd, args.dst)
        print(f"wrote {args.dst}: {len(sd)} tensors ({args.model})")


def _leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _leaves(v)
    else:
        yield tree


if __name__ == "__main__":
    sys.exit(main())
