"""Serving: text-to-image Pipeline + demo entry (reference app.py equivalent).

Parity with reference ``app.py:49-208`` (hhhhzp/DeCo): loads a t2i config +
checkpoint, builds Pipeline(vae, denoiser, conditioner), constructs a
per-request AdamLMSampler (order/steps/cfg/timeshift from the UI), applies CFG
with a negative prompt, returns PIL images plus denoising-trajectory GIFs, and
supports arbitrary H/W (rounded to /32) via the RoPE patch-scaling mechanism
(``decoder_patch_scaling_h/w``, app.py:91-94).

Gradio is optional (``serve_gradio`` gates on import); the CLI path generates
straight to files. Sampler jits are cached per (H, W, steps, order, cfg) —
resolution buckets, SURVEY §7 dynamic-shape note.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from deco_tpu.config import registry
from deco_tpu.diffusion.adam_sampling import AdamLMSampler
from deco_tpu.models.autoencoders import fp_to_uint8


class Pipeline:
    def __init__(self, vae, denoiser, conditioner, params,
                 scheduler=None, base_resolution: int = 512):
        from deco_tpu.diffusion.scheduling import LinearScheduler

        self.vae = vae
        self.denoiser = denoiser
        self.conditioner = conditioner
        self.params = params
        if hasattr(params, "get") and params.get("quant") is not None:
            # int8 serving safety net: a quant cache populated from params
            # other than the ones supplied here (e.g. random init carried
            # past a checkpoint restore) silently serves garbage — verify
            # the stored fingerprints once, at construction.
            from deco_tpu.models.layers import verify_quant_cache

            verify_quant_cache(params)
        self.scheduler = scheduler or LinearScheduler()
        self.base_resolution = base_resolution
        self._jit_cache = {}

    # FIFO bound on (resolution, protocol) entries: each holds jitted
    # executables (a chunked sampler pins up to 32 segment programs), so an
    # unbounded dict would leak compiled programs in a long-lived server
    # cycling request shapes — the same leak sample_chunked's internal cache
    # bounds one level down (diffusion/sampling.py).
    _JIT_CACHE_MAX = 16

    def _get_sampler_fn(self, height, width, num_steps, order, cfg, timeshift,
                        dispatch_chunks=0):
        key = (height, width, num_steps, order, cfg, timeshift,
               dispatch_chunks)
        if key in self._jit_cache:
            return self._jit_cache[key]
        while len(self._jit_cache) >= self._JIT_CACHE_MAX:
            self._jit_cache.pop(next(iter(self._jit_cache)))
        sampler = AdamLMSampler(
            scheduler=self.scheduler, order=order, num_steps=num_steps,
            guidance=cfg, timeshift=timeshift,
        )
        # arbitrary-resolution RoPE rescale (app.py:93-94)
        scale_h = height / self.base_resolution
        scale_w = width / self.base_resolution
        model = dataclasses.replace(
            self.denoiser, patch_scaling_hw=(scale_h, scale_w)
        ) if hasattr(self.denoiser, "patch_scaling_hw") else self.denoiser

        if dispatch_chunks:
            # very large canvases (1536px+): split the sampling scan into
            # separately-dispatched segments so transports that cap
            # single-dispatch wall time (e.g. TPU relays at ~50s) survive.
            # Bit-equal to a collect=False single dispatch (tested at the
            # sampler level); vs THIS class's default path — which compiles
            # a different XLA program to collect trajectories — expect
            # program-level rounding only. No trajectories here.
            net_p = lambda p, x, t, y: model.apply(p, x, t, y)

            def run(params, noise, cond, uncond, rng):
                out = sampler.sample_chunked(
                    net_p, noise, cond, uncond, rng,
                    num_dispatches=dispatch_chunks, params=params)
                return out, out[None]

            self._jit_cache[key] = run
            return run

        @jax.jit
        def run(params, noise, cond, uncond, rng):
            net = lambda x, t, y: model.apply(params, x, t, y)
            return sampler(
                net, noise, cond, uncond, rng=rng, return_x_trajs=True
            )

        self._jit_cache[key] = run
        return run

    def __call__(
        self,
        prompts: List[str],
        negative_prompt: str = "",
        height: int = 512,
        width: int = 512,
        num_steps: int = 25,
        order: int = 2,
        cfg: float = 4.0,
        timeshift: float = 3.0,
        seed: int = 0,
        return_trajectories: bool = False,
        dispatch_chunks: int = 0,
    ):
        height = max((height // 32) * 32, 32)
        width = max((width // 32) * 32, 32)
        if dispatch_chunks and return_trajectories:
            raise ValueError(
                "dispatch_chunks does not collect trajectories; "
                "use dispatch_chunks=0 for trajectory GIFs")
        metadata = {"negative_prompt": negative_prompt}
        cond, uncond = self.conditioner(prompts, metadata)
        noise = jax.random.normal(
            jax.random.PRNGKey(seed), (len(prompts), height, width, 3)
        )
        run = self._get_sampler_fn(height, width, num_steps, order, cfg,
                                   timeshift, dispatch_chunks)
        out, x_trajs = run(self.params, noise, cond, uncond,
                           jax.random.PRNGKey(seed + 1))
        imgs = np.asarray(fp_to_uint8(self.vae.decode(out)))
        pil_images = [Image.fromarray(im) for im in imgs]
        if not return_trajectories:
            return pil_images
        trajs = np.asarray(fp_to_uint8(jnp.clip(x_trajs, -1, 1)))
        gifs = []
        for b in range(len(prompts)):
            frames = [Image.fromarray(trajs[s, b]) for s in range(trajs.shape[0])]
            gifs.append(frames)
        return pil_images, gifs


def load_pipeline(config_path: str, ckpt_path: Optional[str] = None,
                  use_ema: bool = True) -> Pipeline:
    """Build a Pipeline from a (reference-format) YAML config + checkpoint."""
    config = registry.load_yaml(config_path)
    model_cfg = config["model"]
    vae = registry.instantiate(model_cfg["vae"])
    denoiser = registry.instantiate(model_cfg["denoiser"])
    conditioner = registry.instantiate(model_cfg["conditioner"])

    from deco_tpu.ops.quant import model_quant_active, refresh_quant_cache

    warmup_inputs = None  # built lazily: (x, t, cond[:1])

    def _warmup():
        nonlocal warmup_inputs
        if warmup_inputs is None:
            x = jnp.zeros((1, 512, 512, 3))
            cond, _ = conditioner(["warmup"])
            warmup_inputs = (x, jnp.zeros((1,)), cond[:1])
        return warmup_inputs

    if ckpt_path and os.path.isdir(ckpt_path):
        # orbax checkpoint dir
        import optax

        from deco_tpu.train.checkpoint import CheckpointManager
        from deco_tpu.train.state import TrainState

        x, t, cond1 = _warmup()
        variables = denoiser.init(jax.random.PRNGKey(0), x, t, cond1)
        # restore over the 'params' collection ONLY: checkpoints (trained on
        # the exact bf16 path) have no 'quant' subtree, and a quant cache
        # populated at random init must never survive a restore — it would
        # silently serve garbage (see models/layers.verify_quant_cache)
        state = TrainState.create({"params": variables["params"]},
                                  optax.adamw(1e-4))
        state = CheckpointManager(ckpt_path, 0).restore(state)
        params = state.ema_params if use_ema else state.params
    elif ckpt_path:
        # torch .ckpt via the converter (ema_denoiser.* prefix, app.py:56-63)
        from deco_tpu.convert.torch_to_flax import convert_denoiser_ckpt

        params = {"params": convert_denoiser_ckpt(
            ckpt_path, model_kind="deco_t2i", use_ema=use_ema
        )}
    else:
        x, t, cond1 = _warmup()
        params = {"params": denoiser.init(
            jax.random.PRNGKey(0), x, t, cond1
        )["params"]}
    if model_quant_active(denoiser):
        # int8 serving: quantize the weight cache from the FINAL params
        x, t, cond1 = _warmup()
        params = refresh_quant_cache(denoiser, params, x, t, cond1)
    return Pipeline(vae, denoiser, conditioner, params)


def serve_gradio(pipeline: Pipeline, port: int = 7860):
    try:
        import gradio as gr
    except ImportError as e:
        raise RuntimeError(
            "gradio is not installed in this environment; use the CLI "
            "generation path (python -m deco_tpu.serve --prompt ...)"
        ) from e

    def generate(prompt, negative, height, width, steps, cfg, seed):
        imgs, gifs = pipeline(
            [prompt] * 2, negative_prompt=negative, height=int(height),
            width=int(width), num_steps=int(steps), cfg=float(cfg),
            seed=int(seed), return_trajectories=True,
        )
        return imgs

    demo = gr.Interface(
        fn=generate,
        inputs=[
            gr.Textbox(label="prompt"),
            gr.Textbox(label="negative prompt", value=""),
            gr.Slider(256, 1024, 512, step=32, label="height"),
            gr.Slider(256, 1024, 512, step=32, label="width"),
            gr.Slider(1, 100, 25, step=1, label="steps"),
            gr.Slider(1.0, 10.0, 4.0, label="cfg"),
            gr.Number(value=0, label="seed"),
        ],
        outputs=gr.Gallery(label="samples"),
    )
    demo.launch(server_port=port)


def main(argv=None):
    p = argparse.ArgumentParser(prog="deco_tpu.serve")
    p.add_argument("--config", required=True)
    p.add_argument("--ckpt_path", default=None)
    p.add_argument("--prompt", action="append", default=None)
    p.add_argument("--negative_prompt", default="")
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--num_steps", type=int, default=25)
    p.add_argument("--cfg", type=float, default=4.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out_dir", default="./serve_out")
    p.add_argument("--gradio", action="store_true")
    args = p.parse_args(argv)

    pipeline = load_pipeline(args.config, args.ckpt_path)
    if args.gradio:
        serve_gradio(pipeline)
        return
    prompts = args.prompt or ["a photo of a cat"]
    os.makedirs(args.out_dir, exist_ok=True)
    imgs, gifs = pipeline(
        prompts, negative_prompt=args.negative_prompt, height=args.height,
        width=args.width, num_steps=args.num_steps, cfg=args.cfg,
        seed=args.seed, return_trajectories=True,
    )
    for i, (img, frames) in enumerate(zip(imgs, gifs)):
        img.save(os.path.join(args.out_dir, f"sample_{i}.png"))
        frames[0].save(
            os.path.join(args.out_dir, f"traj_{i}.gif"), save_all=True,
            append_images=frames[1:], duration=100, loop=0,
        )
    print(f"wrote {len(imgs)} samples to {args.out_dir}")


if __name__ == "__main__":
    main()
