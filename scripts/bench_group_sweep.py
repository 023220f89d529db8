"""Same-session sweep of DECO_FLASH_GROUP on the headline dispatch."""

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
    model = DeCoC2I(
        in_channels=3, patch_size=16, num_groups=16, hidden_size=1152,
        hidden_size_x=32, num_blocks=31, num_cond_blocks=28, num_classes=1000,
    )
    x0 = jnp.zeros((batch, size, size, 3), jnp.float32)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), x0, jnp.zeros((batch,), jnp.float32),
        jnp.zeros((batch,), jnp.int32))
    sampler = EulerSampler(
        scheduler=LinearScheduler(), num_steps=steps, guidance=3.2,
        guidance_interval_min=0.1, guidance_interval_max=1.0,
    )
    cond = jnp.zeros((batch,), jnp.int32)
    uncond = jnp.full((batch,), 1000, jnp.int32)

    samples = {}
    for gname in sys.argv[1:] or ["auto", "16", "20"]:
        if gname == "auto":
            os.environ.pop("DECO_FLASH_GROUP", None)
        else:
            os.environ["DECO_FLASH_GROUP"] = gname

        def trace():
            @jax.jit
            def sample(params, noise):
                net = lambda x, t, y: model.apply(params, x, t, y)
                return sampler(net, noise, cond, uncond)
            return sample

        fn = trace()
        t0 = time.perf_counter()
        try:
            float(jnp.sum(fn(params, jax.random.normal(jax.random.PRNGKey(1), x0.shape))))
        except Exception as e:
            print(f"g={gname}: COMPILE/RUN FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            continue
        print(f"# compile[g={gname}]: {time.perf_counter()-t0:.1f}s", flush=True)
        samples[gname] = fn
    os.environ.pop("DECO_FLASH_GROUP", None)

    times = {g: [] for g in samples}
    for i in range(3):
        for gname, fn in samples.items():
            noise = jax.random.normal(jax.random.PRNGKey(10 + i), x0.shape)
            t0 = time.perf_counter()
            float(jnp.sum(fn(params, noise)))
            times[gname].append(time.perf_counter() - t0)
    for gname, ts in times.items():
        mean = sum(ts) / len(ts)
        print(f"g={gname:5s} {batch/mean:7.3f} img/s  mean {mean*1000:7.1f} ms "
              f"({', '.join(f'{t*1000:.0f}' for t in ts)})", flush=True)


if __name__ == "__main__":
    main()
