"""1024px c2i sampling capability probe: 4096 tokens through the Pallas flash path.

The reference tops out at 512px (1024 tokens); this demonstrates the 1024px
regime the long-sequence flash kernels target. Measured v5e-1: b2 50-step CFG
= 0.148 img/s/chip, finite output (attention grows 16x vs 512px).
"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
from deco_tpu.models.dit_c2i_deco import DeCoC2I
from deco_tpu.diffusion.sampling import EulerSampler
from deco_tpu.diffusion.scheduling import LinearScheduler

model = DeCoC2I(in_channels=3, patch_size=16, num_groups=16, hidden_size=1152,
                hidden_size_x=32, num_blocks=31, num_cond_blocks=28,
                num_classes=1000)
batch, res, steps = 2, 1024, 50
rng = jax.random.PRNGKey(0)
x = jnp.zeros((batch, res, res, 3), jnp.float32)
params = jax.jit(model.init)(rng, x, jnp.zeros((batch,)), jnp.zeros((batch,), jnp.int32))
sampler = EulerSampler(scheduler=LinearScheduler(), num_steps=steps,
                       guidance=3.2, guidance_interval=(0.1, 1.0))
@jax.jit
def run(p, noise, cond, uncond, r):
    net = lambda xt, t, y: model.apply(p, xt, t, y)
    return sampler(net, noise, cond, uncond, r)
cond = jnp.zeros((batch,), jnp.int32)
uncond = jnp.full((batch,), 1000, jnp.int32)
noise = jax.random.normal(jax.random.fold_in(rng, 1), (batch, res, res, 3))
t0 = time.perf_counter()
out = run(params, noise, cond, uncond, jax.random.fold_in(rng, 2))
v = float(jnp.mean(out)); compile_s = time.perf_counter() - t0
t0 = time.perf_counter()
out = run(params, noise + 1e-3, cond, uncond, jax.random.fold_in(rng, 3))
v = float(jnp.mean(out)); dt = time.perf_counter() - t0
assert np.isfinite(v)
print(f"1024px b{batch} {steps}-step CFG: {dt:.2f}s = {batch/dt:.3f} img/s/chip "
      f"(4096 tokens, compile {compile_s:.0f}s, mean {v:.4f})")
