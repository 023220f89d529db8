"""Long-sequence c2i sampling capability probe (1024px/4096 tokens and up).

The reference tops out at 512px (1024 tokens); this demonstrates the regimes
the long-sequence flash kernels target. Measured v5e-1: 1024px b2 50-step
CFG-interval = 0.148 img/s/chip (CFG always-on in that run — the interval
kwarg was silently dropped pre-fix), finite output.

Usage: python scripts/bench_1024px.py [batch] [res] [steps]
"""

# runnable as `python scripts/<name>.py` from anywhere
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
from deco_tpu.models.dit_c2i_deco import DeCoC2I
from deco_tpu.diffusion.sampling import EulerSampler
from deco_tpu.diffusion.scheduling import LinearScheduler

model = DeCoC2I(in_channels=3, patch_size=16, num_groups=16, hidden_size=1152,
                hidden_size_x=32, num_blocks=31, num_cond_blocks=28,
                num_classes=1000)
batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2
res = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
steps = int(sys.argv[3]) if len(sys.argv) > 3 else 50
# >0: split the scan into this many separately-dispatched segments via
# EulerSampler.sample_chunked (needed past ~1024px: the relay transport kills
# single dispatches beyond ~45-55s of device time — measured 30-step=54s
# crashed / 25-step=45s ran; 2048px/50-step is ~90s at 1.8 s/step).
dispatch_chunks = int(sys.argv[4]) if len(sys.argv) > 4 else 0
rng = jax.random.PRNGKey(0)
x = jnp.zeros((batch, res, res, 3), jnp.float32)
params = jax.jit(model.init)(rng, x, jnp.zeros((batch,)), jnp.zeros((batch,), jnp.int32))
sampler = EulerSampler(scheduler=LinearScheduler(), num_steps=steps,
                       guidance=3.2, guidance_interval_min=0.1,
                       guidance_interval_max=1.0)
net_p = lambda p, xt, t, y: model.apply(p, xt, t, y)
if dispatch_chunks:
    def run(p, noise, cond, uncond, r):
        return sampler.sample_chunked(net_p, noise, cond, uncond, r,
                                      num_dispatches=dispatch_chunks,
                                      params=p)
else:
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
chunk_note = f", {dispatch_chunks} dispatches" if dispatch_chunks else ""
print(f"{res}px b{batch} {steps}-step CFG: {dt:.2f}s = {batch/dt:.3f} img/s/chip "
      f"({(res // 16) ** 2} tokens, compile {compile_s:.0f}s, mean {v:.4f}"
      f"{chunk_note})")
