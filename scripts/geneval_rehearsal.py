"""Protocol-scale GenEval pipeline rehearsal (t2i twin of fid_rehearsal.py).

Runs the reference GenEval protocol end-to-end at reduced prompt count on the
attached chip: DeCo-XXL/16 t2i at 512px built from the SHIPPED
configs_t2i/sft_res512.yaml surface (AdamLM order 2, 25 steps, CFG 4.0,
timeshift 3.0 — the sampler node is instantiated from the YAML, not
re-declared here), the vendored GenEval prompt metadata
(evaluations/geneval/evaluation_metadata.jsonl), seeded per-sample noise, and
the exact ``<idx>/samples/<seed>.png`` + ``metadata.jsonl`` scorer layout
(reference src/data/dataset/geneval.py:8-45).

Weights are random and the conditioner falls back to the deterministic hash
embedding (no Qwen3 weights in this zero-egress environment), so scorer
OUTPUT is meaningless — the rehearsal validates the full t2i predict
mechanics + the scorer file contract at protocol scale and records img/s with
an extrapolation to the full 553-prompt x4 GenEval run.

Usage: python scripts/geneval_rehearsal.py [num_prompts=20] [batch=4]
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

META = os.path.join(REPO, "evaluations", "geneval",
                    "evaluation_metadata.jsonl")


def main(num_prompts=20, batch=4, workdir="/tmp/geneval_rehearsal",
         samples_per_prompt=4):
    from deco_tpu.config import registry
    from deco_tpu.data.geneval import GenEvalDataset
    from deco_tpu.data.loader import make_loader
    from deco_tpu.models.autoencoders import fp_to_uint8
    from deco_tpu.train.hooks import SaveImagesHook

    on_tpu = jax.devices()[0].platform != "cpu"
    size = 512 if on_tpu else 32

    config = registry.load_yaml(
        os.path.join(REPO, "configs_t2i", "sft_res512.yaml"))
    model_cfg = config["model"]
    if not on_tpu:  # CPU smoke geometry
        model_cfg["denoiser"]["init_args"].update(
            hidden_size=64, num_groups=4, num_encoder_blocks=2,
            num_decoder_blocks=1, num_text_blocks=1, decoder_hidden_size=8,
            txt_embed_dim=32)
        model_cfg["conditioner"]["init_args"]["embed_dim"] = 32
    vae = registry.instantiate(model_cfg["vae"])
    denoiser = registry.instantiate(model_cfg["denoiser"])
    conditioner = registry.instantiate(model_cfg["conditioner"])
    sampler = registry.instantiate(model_cfg["diffusion_sampler"])

    # first num_prompts lines of the vendored GenEval metadata (clamped to
    # what the file actually holds — 553 prompts upstream)
    subset_path = os.path.join(workdir, "geneval_subset.jsonl")
    os.makedirs(workdir, exist_ok=True)
    with open(META) as fp:
        lines = fp.readlines()[:num_prompts]
    num_prompts = len(lines)
    with open(subset_path, "w") as fp:
        fp.writelines(lines)

    ds = GenEvalDataset(subset_path, samples_per_prompt, (3, size, size))
    # drop_last=False: every prompt/seed must reach the scorer layout even
    # when batch does not divide the sample count
    loader = make_loader(ds, batch, infinite=False, shuffle=False,
                         num_workers=2, drop_last=False)

    cond0, _ = conditioner(["warmup"])
    params = jax.jit(denoiser.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)),
        jnp.zeros((1,)), cond0[:1])

    @jax.jit
    def sample(params, noise, cond, uncond):
        net = lambda x, t, y: denoiser.apply(params, x, t, y)
        return sampler(net, noise, cond, uncond)

    total = len(ds)
    hook = SaveImagesHook(save_dir="geneval_out", max_save_images=total)
    hook.on_predict_start(workdir, 0)

    t_start = time.perf_counter()
    n_done = 0
    for noise, prompts, meta in loader:
        cond, uncond = conditioner(list(prompts), meta)
        noise = jnp.asarray(np.asarray(noise), jnp.float32)
        imgs = sample(params, noise, jnp.asarray(cond), jnp.asarray(uncond))
        u8 = np.asarray(jax.device_get(fp_to_uint8(vae.decode(imgs))))
        hook.on_predict_batch_end(u8, meta)
        n_done += u8.shape[0]
        if n_done % (batch * 5) == 0:
            rate = n_done / (time.perf_counter() - t_start)
            print(f"# {n_done}/{total} at {rate:.2f} img/s", file=sys.stderr)
    hook.on_predict_end()
    elapsed = time.perf_counter() - t_start

    # --- validate the exact scorer layout ---
    root = hook.root
    n_dirs = 0
    for idx in range(total):
        d = os.path.join(root, str(idx))
        if not os.path.isdir(d):
            continue
        n_dirs += 1
        md = json.loads(open(os.path.join(d, "metadata.jsonl")).read())
        assert "prompt" in md and "seed" in md, md
        png = os.path.join(d, "samples", f"{md['seed']}.png")
        assert os.path.isfile(png), png
    assert n_dirs == total, (n_dirs, total)

    rate = n_done / elapsed
    full = 553 * samples_per_prompt
    print(f"geneval_rehearsal: {num_prompts} prompts x {samples_per_prompt} "
          f"at {size}px AdamLM-25 CFG4: {elapsed:.0f}s = {rate:.2f} "
          f"img/s/chip; scorer layout ok ({n_dirs} sample dirs); "
          f"full GenEval ({full} imgs) extrapolation = "
          f"{full / rate / 60:.1f} chip-minutes")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    main(n, b)
