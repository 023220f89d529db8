"""t2i throughput probe: DeCo-XXL/16 512px, AdamLM order-2, 25 steps, CFG 4.

The second headline workload (BASELINE.md: GenEval/DPG model,
configs_t2i/sft_res512.yaml). Random weights — throughput is shape-driven.
Usage: python scripts/bench_t2i.py [batch] [size]

size=1024 probes the arbitrary-resolution regime (4096 image tokens) the
extrapolating t2i RoPE enables (reference demo app.py:91-94 tops out at
512px + patch scaling; there is no upstream 1024px t2i number).
"""

# runnable as `python scripts/<name>.py` from anywhere
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def main(batch=4, steps=25, size=512, dispatch_chunks=0):
    from deco_tpu.config.registry import load_yaml, instantiate

    cfg = load_yaml("/root/repo/configs_t2i/sft_res512.yaml")
    model = instantiate(cfg["model"]["denoiser"])
    sampler = instantiate(cfg["model"]["diffusion_sampler"])

    txt_len, txt_dim = 128, 2048
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((batch, size, size, 3), jnp.float32)
    t = jnp.zeros((batch,), jnp.float32)
    y = jnp.zeros((batch, txt_len, txt_dim), jnp.float32)
    params = jax.jit(model.init)(rng, x, t, y)

    net_p = lambda p, xt, t, yy: model.apply(p, xt, t, yy)

    if dispatch_chunks:
        # split the AdamLM scan into separately-dispatched segments (the
        # relay kills single dispatches past ~50s device time; needed for
        # the 2048px/16,384-token probe)
        def sample(params, noise, cond, uncond, rng):
            return sampler.sample_chunked(
                net_p, noise, cond, uncond, rng,
                num_dispatches=dispatch_chunks, params=params)
    else:
        @jax.jit
        def sample(params, noise, cond, uncond, rng):
            net = lambda xt, t, yy: model.apply(params, xt, t, yy)
            return sampler(net, noise, cond, uncond, rng=rng)

    def run(seed):
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        noise = jax.random.normal(k1, (batch, size, size, 3), jnp.float32)
        cond = jax.random.normal(k2, (batch, txt_len, txt_dim), jnp.float32)
        uncond = jnp.zeros_like(cond)
        imgs = sample(params, noise, cond, uncond, jax.random.PRNGKey(seed))
        return float(jnp.sum(imgs.astype(jnp.float32)))

    t0 = time.perf_counter()
    run(0)
    compile_s = time.perf_counter() - t0
    n = 3
    t0 = time.perf_counter()
    for i in range(n):
        run(i + 1)
    dt = (time.perf_counter() - t0) / n
    note = f", {dispatch_chunks} dispatches" if dispatch_chunks else ""
    print(f"t2i {size}px batch={batch} AdamLM-{steps}: {dt:.2f} s/batch = "
          f"{batch/dt:.3f} img/s/chip  (compile+1st {compile_s:.1f}s{note})")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4,
         size=int(sys.argv[2]) if len(sys.argv) > 2 else 512,
         dispatch_chunks=int(sys.argv[3]) if len(sys.argv) > 3 else 0)
