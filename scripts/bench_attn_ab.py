"""Same-session in-context A/B: grouped unpadded flash fwd vs legacy layout.

Runs the exact bench.py dispatch (DeCo-XL 256px, 50-step Euler CFG, b20)
twice per iteration — one program traced with DECO_FLASH_PAD=1 +
DECO_FLASH_GROUP=1 (the round-4 layout: D zero-padded to 128 in HBM, one
(b,h) plane per kernel program) and one with the default (true-D operands,
_pick_group planes per program) — interleaved, fresh noise + host readback
per call (the relay-safe protocol).
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
    model = DeCoC2I(**model_kw)

    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((batch, size, size, 3), jnp.float32)
    params = jax.jit(model.init)(
        rng, x0, jnp.zeros((batch,), jnp.float32),
        jnp.zeros((batch,), jnp.int32))
    sampler = EulerSampler(
        scheduler=LinearScheduler(), num_steps=steps, guidance=3.2,
        guidance_interval_min=0.1, guidance_interval_max=1.0,
    )
    cond = jnp.zeros((batch,), jnp.int32)
    uncond = jnp.full((batch,), 1000 if on_tpu else 10, jnp.int32)

    def make(name, env):
        for k_, v_ in env.items():
            os.environ[k_] = v_

        @jax.jit
        def sample(params, noise):
            net = lambda x, t, y: model.apply(params, x, t, y)
            return sampler(net, noise, cond, uncond)

        t0 = time.perf_counter()
        float(jnp.sum(sample(params, jax.random.normal(jax.random.PRNGKey(1), x0.shape))))
        print(f"# compile[{name}]: {time.perf_counter()-t0:.1f}s", flush=True)
        for k_ in env:
            del os.environ[k_]
        return sample

    sample_old = make("legacy", {"DECO_FLASH_PAD": "1", "DECO_FLASH_GROUP": "1"})
    sample_new = make("grouped", {})
    times = {"legacy": [], "grouped": []}
    for i in range(4):
        for name, fn in (("legacy", sample_old), ("grouped", sample_new)):
            noise = jax.random.normal(jax.random.PRNGKey(10 + i), x0.shape)
            t0 = time.perf_counter()
            float(jnp.sum(fn(params, noise)))
            times[name].append(time.perf_counter() - t0)
    for name, ts in times.items():
        mean = sum(ts) / len(ts)
        print(f"{name:7s} {batch/mean:7.3f} img/s  mean {mean*1000:7.1f} ms "
              f"({', '.join(f'{t*1000:.0f}' for t in ts)})", flush=True)


if __name__ == "__main__":
    main()
