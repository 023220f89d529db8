"""Same-session headline A/B: exact bf16 path vs the opt-in W8A8 int8 trunk.

Traces the bench.py dispatch twice in one process — once with DECO_QUANT
unset (the golden-parity bf16 path) and once with DECO_QUANT=int8 (trunk
GEMMs on the int8 MXU path, weights cached in the `quant` collection) —
then times them interleaved with fresh noise + a host readback per call.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from deco_tpu.diffusion.sampling import EulerSampler
from deco_tpu.diffusion.scheduling import LinearScheduler
from deco_tpu.models.dit_c2i_deco import DeCoC2I


def main():
    batch, steps, size = 20, 50, 256
    kw = dict(
        in_channels=3, patch_size=16, num_groups=16, hidden_size=1152,
        hidden_size_x=32, num_blocks=31, num_cond_blocks=28, num_classes=1000,
    )
    x0 = jnp.zeros((batch, size, size, 3), jnp.float32)
    t0_ = jnp.zeros((batch,), jnp.float32)
    y0 = jnp.zeros((batch,), jnp.int32)
    sampler = EulerSampler(
        scheduler=LinearScheduler(), num_steps=steps, guidance=3.2,
        guidance_interval_min=0.1, guidance_interval_max=1.0,
    )
    cond = jnp.zeros((batch,), jnp.int32)
    uncond = jnp.full((batch,), 1000, jnp.int32)

    runs = {}
    for name, quant in (("bf16", None), ("int8", "int8")):
        model = DeCoC2I(**kw, quantize=quant)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), x0, t0_, y0)

        @jax.jit
        def sample(variables, noise):
            net = lambda x, t, y: model.apply(variables, x, t, y)
            return sampler(net, noise, cond, uncond)

        t0 = time.perf_counter()
        float(jnp.sum(sample(variables, jax.random.normal(jax.random.PRNGKey(1), x0.shape))))
        print(f"# compile[{name}]: {time.perf_counter()-t0:.1f}s", flush=True)
        runs[name] = (sample, variables)

    times = {n: [] for n in runs}
    for i in range(3):
        for name, (fn, variables) in runs.items():
            noise = jax.random.normal(jax.random.PRNGKey(10 + i), x0.shape)
            t0 = time.perf_counter()
            float(jnp.sum(fn(variables, noise)))
            times[name].append(time.perf_counter() - t0)
    for name, ts in times.items():
        mean = sum(ts) / len(ts)
        print(f"{name:5s} {batch/mean:7.3f} img/s  mean {mean*1000:7.1f} ms "
              f"({', '.join(f'{t*1000:.0f}' for t in ts)})", flush=True)


if __name__ == "__main__":
    main()
