"""End-to-end eval-harness dry-run: GenEval + DPG + ADM-FID artifact layouts.

One command produces scorer-ready directories from the vendored prompt assets
(VERDICT round-1 item 7):

- GenEval: ``evaluations/geneval/evaluation_metadata.jsonl`` ->
  ``<out>/geneval/<idx>/samples/<seed>.png`` + ``metadata.jsonl`` (the exact
  layout GenEval's scorer walks; reference src/data/dataset/geneval.py:8-20);
- DPG: ``evaluations/dpg/prompts/*.txt`` -> per-prompt samples + the 2x2 grid
  concat the DPG scorer consumes (reference evaluations/dpg/dpg_cat_image.py);
- ADM FID: sampler output accumulated to ``output.npz`` (key ``arr_0``) and
  scored in-framework with :func:`deco_tpu.train.metrics.fid_from_images`.

The model is a tiny randomly initialized DeCoT2I by default (layout check,
not quality); pass --config/--ckpt_path for a real run.

Usage:
    python scripts/eval_dryrun.py --out /tmp/eval_dryrun --num-prompts 2
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def tiny_pipeline(resolution: int = 32):
    """Tiny random-weight t2i pipeline: (sample_fn, latent_shape)."""
    import jax
    import jax.numpy as jnp

    from deco_tpu.diffusion.sampling import EulerSampler
    from deco_tpu.diffusion.scheduling import LinearScheduler
    from deco_tpu.models.conditioners import Qwen3TextEncoder
    from deco_tpu.models.dit_t2i import DeCoT2I

    model = DeCoT2I(
        in_channels=3, patch_size=4, num_groups=4, hidden_size=64,
        txt_embed_dim=32, txt_max_length=16, num_text_blocks=1,
        decoder_hidden_size=16, num_encoder_blocks=2, num_decoder_blocks=1,
    )
    conditioner = Qwen3TextEncoder(embed_dim=32, max_length=16)
    rng = jax.random.PRNGKey(0)
    cond0, _ = conditioner(["warmup"])
    x0 = jnp.zeros((1, resolution, resolution, 3))
    params = model.init(rng, x0, jnp.zeros((1,)), cond0)
    sampler = EulerSampler(num_steps=4, guidance=2.0,
                           scheduler=LinearScheduler())

    @jax.jit
    def sample(noise, cond, uncond, rng):
        net = lambda xt, t, y: model.apply(params, xt, t, y)
        return sampler(net, noise, cond, uncond, rng=rng)

    return sample, conditioner, (3, resolution, resolution)


def run_geneval(out_dir: str, num_prompts: int, samples_per: int,
                sample, conditioner, latent_shape):
    from deco_tpu.data.geneval import GenEvalDataset
    from deco_tpu.models.autoencoders import fp_to_uint8

    import jax
    import jax.numpy as jnp
    import numpy as np

    meta_path = os.path.join(REPO, "evaluations/geneval/evaluation_metadata.jsonl")
    ds = GenEvalDataset(meta_path, samples_per, latent_shape)
    os.makedirs(out_dir, exist_ok=True)
    n = num_prompts * samples_per
    rng = jax.random.PRNGKey(0)
    for i in range(n):
        noise, prompt, md = ds[i]
        noise = jnp.asarray(noise)[None]  # seeded_noise is already HWC
        cond, uncond = conditioner([prompt])
        img = sample(noise, cond, uncond, jax.random.fold_in(rng, i))
        u8 = np.asarray(jax.device_get(fp_to_uint8(img)))[0]
        md["save_fn"](u8, {k: v for k, v in md.items() if k != "save_fn"},
                      out_dir)
    # layout check: GenEval scorer expects <idx>/samples/<seed>.png
    for i in range(n):
        inst = ds[i][2]["filename"]
        assert os.path.isdir(os.path.join(out_dir, inst, "samples")), inst
        assert os.path.exists(os.path.join(out_dir, inst, "metadata.jsonl"))
    return n


def run_dpg(out_dir: str, num_prompts: int, sample, conditioner, latent_shape,
            samples_per: int = 4):
    from deco_tpu.data.dpg import DPGDataset, concat_dpg_grids
    from deco_tpu.models.autoencoders import fp_to_uint8

    import jax
    import jax.numpy as jnp
    import numpy as np

    prompts = os.path.join(REPO, "evaluations/dpg/prompts")
    ds = DPGDataset(prompts, samples_per, latent_shape)
    raw = os.path.join(out_dir, "samples")
    os.makedirs(raw, exist_ok=True)
    rng = jax.random.PRNGKey(1)
    for i in range(num_prompts * samples_per):
        noise, prompt, md = ds[i]
        noise = jnp.asarray(noise)[None]  # seeded_noise is already HWC
        cond, uncond = conditioner([prompt])
        img = sample(noise, cond, uncond, jax.random.fold_in(rng, i))
        u8 = np.asarray(jax.device_get(fp_to_uint8(img)))[0]
        md["save_fn"](u8, {k: v for k, v in md.items() if k != "save_fn"}, raw)
    grids = os.path.join(out_dir, "grids")
    concat_dpg_grids(raw, grids, num_samples=samples_per)
    made = [f for f in os.listdir(grids) if f.endswith(".png")]
    assert len(made) == num_prompts, (len(made), num_prompts)
    return len(made)


def run_adm_fid(out_dir: str, sample, conditioner, latent_shape, n: int = 8):
    """Predict -> ADM output.npz -> in-framework FID (protocol check)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deco_tpu.models.autoencoders import fp_to_uint8
    from deco_tpu.train.hooks import SaveImagesHook
    from deco_tpu.train.metrics import fid_from_images

    hook = SaveImagesHook(save_dir="adm", save_compressed=True)
    hook.on_predict_start(out_dir, 0)
    rng = jax.random.PRNGKey(2)
    c, h, w = latent_shape
    for i in range(2):
        noise = jax.random.normal(jax.random.fold_in(rng, i),
                                  (n // 2, h, w, c))
        cond, uncond = conditioner(["a cat"] * (n // 2))
        img = sample(noise, cond, uncond, jax.random.fold_in(rng, 100 + i))
        hook.on_predict_batch_end(
            np.asarray(jax.device_get(fp_to_uint8(img))), {})
    npz_path = hook.on_predict_end()
    arr = np.load(npz_path)["arr_0"]
    assert arr.shape == (n, h, w, 3) and arr.dtype == np.uint8, arr.shape
    # in-framework FID between the two halves (self-consistency smoke)
    fid = fid_from_images(arr[: n // 2] / 255.0, arr[n // 2:] / 255.0)
    return npz_path, float(fid)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/eval_dryrun")
    p.add_argument("--num-prompts", type=int, default=2)
    p.add_argument("--samples-per", type=int, default=2)
    p.add_argument("--resolution", type=int, default=32)
    args = p.parse_args(argv)

    sample, conditioner, latent_shape = tiny_pipeline(args.resolution)
    n1 = run_geneval(os.path.join(args.out, "geneval"), args.num_prompts,
                     args.samples_per, sample, conditioner, latent_shape)
    n2 = run_dpg(os.path.join(args.out, "dpg"), args.num_prompts, sample,
                 conditioner, latent_shape, samples_per=4)
    npz, fid = run_adm_fid(os.path.join(args.out), sample, conditioner,
                           latent_shape)
    print(json.dumps({"geneval_samples": n1, "dpg_grids": n2,
                      "adm_npz": npz, "self_fid": fid}))


if __name__ == "__main__":
    main()
