"""In-context ablation breakdown of the headline sampling dispatch.

Measures where the 50-step DeCo-XL CFG sampler's wall time goes by ablating
one component at a time INSIDE the full scan (the only trustworthy protocol —
standalone micro-dispatches carry ~20-25ms of fixed relay overhead and have
repeatedly produced false leads, see CLAUDE.md "per-pixel-decoder fusion").

Each mode monkeypatches one component to a near-free stand-in, then runs the
exact bench.py protocol (batch 20, 50-step Euler CFG 3.2 interval (0.1,1],
fresh noise + host readback per iter, 3 iters). The time DELTA vs `full` is
that component's in-context share.

Usage: python scripts/bench_ablate.py [mode ...]
Modes: full noattn norope noswiglu nodecoder notrunk
(default: all, in that order)
"""

import importlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from flax import linen as nn

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from deco_tpu.models import layers

_REAL_SDPA = layers.sdpa
_REAL_ROPE = layers.apply_rope
_REAL_SWIGLU = layers.SwiGLU
_REAL_DECODER = layers.run_pixel_decoder


def _sdpa_identity(q, k, v, mask=None, dtype=jnp.bfloat16, impl="auto",
                   extra_kv=None):
    # keep qkv/proj GEMMs; drop only the attention math (scores+softmax+pv)
    return v


def _rope_identity(xq, xk, rope):
    return xq, xk


class _ZeroSwiGLU(layers.SwiGLU):
    # drop both MLP GEMMs + the gate; the residual stream continues

    @nn.compact
    def __call__(self, x):
        return jnp.zeros_like(x)


def _decoder_linear(x_pix, s, *, decoder_chunks=0, grad_checkpoint=False,
                    model_channels=32, out_channels=3, num_res_blocks=3,
                    patch_size=16, dtype=jnp.bfloat16):
    # near-free stand-in with the decoder's output shape
    return x_pix[..., :out_channels]


ABLATIONS = {
    "full": {},
    "noattn": {"sdpa": _sdpa_identity},
    "norope": {"apply_rope": _rope_identity},
    "noswiglu": {"swiglu": _ZeroSwiGLU},
    "nodecoder": {"decoder": _decoder_linear},
    "notrunk": {"trunk": True},
}


def run_mode(mode):
    spec = ABLATIONS[mode]
    # reset all patches, then apply this mode's; reload the model module so
    # its globals (run_dit_blocks) are fresh before any trunk patch
    layers.sdpa = spec.get("sdpa", _REAL_SDPA)
    layers.apply_rope = spec.get("apply_rope", _REAL_ROPE)
    layers.SwiGLU = spec.get("swiglu", _REAL_SWIGLU)
    layers.run_pixel_decoder = spec.get("decoder", _REAL_DECODER)
    import deco_tpu.models.dit_c2i_deco as dit
    importlib.reload(dit)
    if spec.get("trunk"):
        dit.run_dit_blocks = lambda s, c, rope, mask, **kw: (s, None)

    from deco_tpu.diffusion.sampling import EulerSampler
    from deco_tpu.diffusion.scheduling import LinearScheduler

    on_tpu = jax.devices()[0].platform != "cpu"
    batch = 20 if on_tpu else 2
    steps = 50 if on_tpu else 2
    size = 256 if on_tpu else 32
    model_kw = dict(
        in_channels=3, patch_size=16, num_groups=16, hidden_size=1152,
        hidden_size_x=32, num_blocks=31, num_cond_blocks=28, num_classes=1000,
    )
    if not on_tpu:
        model_kw.update(hidden_size=64, num_groups=4, num_blocks=4,
                        num_cond_blocks=2, hidden_size_x=16, patch_size=8)
    model = dit.DeCoC2I(**model_kw)

    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((batch, size, size, 3), jnp.float32)
    t0 = jnp.zeros((batch,), jnp.float32)
    y0 = jnp.zeros((batch,), jnp.int32)
    params = jax.jit(model.init)(rng, x0, t0, y0)

    sampler = EulerSampler(
        scheduler=LinearScheduler(), num_steps=steps, guidance=3.2,
        guidance_interval_min=0.1, guidance_interval_max=1.0,
    )
    cond = jnp.zeros((batch,), jnp.int32)
    uncond = jnp.full((batch,), 1000 if on_tpu else 10, jnp.int32)

    @jax.jit
    def sample(params, noise):
        net = lambda x, t, y: model.apply(params, x, t, y)
        return sampler(net, noise, cond, uncond)

    t_c = time.perf_counter()
    float(jnp.sum(sample(params, jax.random.normal(jax.random.PRNGKey(1), x0.shape))))
    compile_s = time.perf_counter() - t_c
    per_iter = []
    for i in range(3):
        noise_i = jax.random.normal(jax.random.PRNGKey(2 + i), x0.shape)
        t_it = time.perf_counter()
        float(jnp.sum(sample(params, noise_i)))
        per_iter.append(time.perf_counter() - t_it)
    mean_s = sum(per_iter) / len(per_iter)
    img_s = batch / mean_s
    print(f"{mode:10s} {img_s:7.3f} img/s  mean {mean_s*1000:7.1f} ms "
          f"({', '.join(f'{t*1000:.0f}' for t in per_iter)})  "
          f"compile {compile_s:.0f}s", flush=True)
    return mean_s


def main():
    modes = sys.argv[1:] or ["full", "noattn", "norope", "noswiglu",
                             "nodecoder", "notrunk"]
    results = {}
    for mode in modes:
        results[mode] = run_mode(mode)
    if "full" in results:
        base = results["full"]
        print("\n# component shares (delta vs full, 50-step dispatch):")
        for mode, t in results.items():
            if mode == "full":
                continue
            print(f"#   {mode:10s} {base - t:+7.3f} s  "
                  f"({(base - t) / base * 100:+5.1f}% of dispatch)")


if __name__ == "__main__":
    main()
