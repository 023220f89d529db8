"""DCAE decoder reconstruction evaluation CLI (reference eval_dcae.py).

Equivalent of the reference's ``eval_dcae.py:39-121`` (hhhhzp/DeCo): loads a
frozen vision encoder + DCAE decoder, runs image reconstruction over an eval
folder with pad/crop to the encoder grid, and reports PSNR/SSIM (the
reconstruction-metrics callbacks of SURVEY §2.12).

Usage:
    python -m deco_tpu.eval_dcae --image_root /path/imgs --resolution 224 \
        [--ckpt_path orbax_dir]
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np


def evaluate(image_root: str, resolution: int = 224, batch_size: int = 4,
             max_batches: int = 8, ckpt_path: str = None,
             llm_hidden_size: int = 1024, seed: int = 0):
    from deco_tpu.data.image_txt import IMG_EXTS
    from deco_tpu.data.imagenet import PixImageNet
    from deco_tpu.data.loader import ShardedLoader
    from deco_tpu.models.internvl import InternVLVision
    from deco_tpu.models.uniflow.vit import ViTConfig
    from deco_tpu.models.vae_models import DCAEDecoderEval
    from deco_tpu.train import metrics as M

    vit = ViTConfig()
    encoder = InternVLVision(vit=vit, llm_hidden_size=llm_hidden_size)
    decoder = DCAEDecoderEval(llm_hidden_size=llm_hidden_size)

    dataset = PixImageNet(image_root, resolution=resolution)
    loader = ShardedLoader(dataset, batch_size, shuffle=False, num_workers=2)

    rng = jax.random.PRNGKey(seed)
    x0 = jnp.zeros((batch_size, resolution, resolution, 3))
    enc_params = encoder.init(rng, x0)
    feats0 = encoder.apply(enc_params, x0)
    dec_params = decoder.init(jax.random.fold_in(rng, 1), feats0)
    if ckpt_path:
        import orbax.checkpoint as ocp

        restored = ocp.StandardCheckpointer().restore(ckpt_path)
        dec_params = restored.get("decoder", dec_params)

    @jax.jit
    def recon(x):
        feats = encoder.apply(enc_params, x)
        out = decoder.apply(dec_params, feats)
        # pad/crop the decoder output back to the input size
        h = min(out.shape[1], x.shape[1])
        w = min(out.shape[2], x.shape[2])
        return out[:, :h, :w], x[:, :h, :w]

    psnrs, ssims = [], []
    for bi, (bx, _, _) in enumerate(loader):
        if bi >= max_batches:
            break
        out, ref = recon(jnp.asarray(bx))
        out01 = jnp.clip(out * 0.5 + 0.5, 0, 1) * 255
        ref01 = jnp.clip(ref * 0.5 + 0.5, 0, 1) * 255
        psnrs.append(float(M.psnr(out01, ref01)))
        ssims.append(float(M.ssim(out01, ref01)))
    result = {
        "psnr": float(np.mean(psnrs)) if psnrs else float("nan"),
        "ssim": float(np.mean(ssims)) if ssims else float("nan"),
        "num_batches": len(psnrs),
    }
    print(json.dumps(result))
    return result


def main(argv=None):
    p = argparse.ArgumentParser(prog="deco_tpu.eval_dcae")
    p.add_argument("--image_root", required=True)
    p.add_argument("--resolution", type=int, default=224)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--max_batches", type=int, default=8)
    p.add_argument("--ckpt_path", default=None)
    p.add_argument("--llm_hidden_size", type=int, default=1024)
    args = p.parse_args(argv)
    evaluate(args.image_root, args.resolution, args.batch_size,
             args.max_batches, args.ckpt_path, args.llm_hidden_size)


if __name__ == "__main__":
    main()
