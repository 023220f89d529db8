"""Training-step throughput probe: remat vs no-remat at several batch sizes.

Usage: python scripts/bench_train.py [batch] [remat:0/1]
Measures the full jitted DeCo-XL train step (loss+grad+adamw+EMA, donated
state) end-to-end on the attached chip. Each step mutates the state, so the
relay cannot elide repeats; timing is wall-clock across N steps with a final
readback.
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


def main(batch=32, remat=True, steps=8, dec_blocks=6, res=256,
         remat_policy="full", decoder_chunks=0):
    import optax

    from deco_tpu.diffusion.scheduling import LinearScheduler
    from deco_tpu.diffusion.training import DeCoTrainer
    from deco_tpu.models.dit_c2i_deco import DeCoC2I
    from deco_tpu.train.state import TrainState
    from deco_tpu.train.train_step import make_train_step

    model = DeCoC2I(
        in_channels=3, patch_size=16, num_groups=16, hidden_size=1152,
        hidden_size_x=64, num_blocks=22 + dec_blocks, num_cond_blocks=22,
        num_classes=1000,
        grad_checkpoint=remat,
        trunk_remat_policy=remat_policy,
        decoder_chunks=decoder_chunks,
    )
    trainer = DeCoTrainer(scheduler=LinearScheduler(), lognorm_t=True,
                          enable_freq_loss=True)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((batch, res, res, 3), jnp.float32)
    t = jnp.zeros((batch,), jnp.float32)
    y = jnp.zeros((batch,), jnp.int32)
    variables = jax.jit(model.init)(rng, x, t, y)
    tx = optax.adamw(1e-4, weight_decay=0.0)
    state = TrainState.create(params=variables, tx=tx)
    apply_fn = lambda p, x_t, t, y, **kw: model.apply(p, x_t, t, y, **kw)
    step_fn = make_train_step(apply_fn, trainer)

    data = np.random.RandomState(0).randn(batch, res, res, 3).astype(np.float32)
    cond = np.arange(batch, dtype=np.int32) % 1000
    uncond = np.full((batch,), 1000, np.int32)
    mk = lambda i: {"x": jnp.asarray(data + i * 1e-3),
                    "condition": jnp.asarray(cond),
                    "uncondition": jnp.asarray(uncond)}
    t0 = time.perf_counter()
    state, metrics = step_fn(state, mk(0), jax.random.PRNGKey(1))
    float(metrics["loss"])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(steps):
        state, metrics = step_fn(state, mk(i + 1), jax.random.PRNGKey(2 + i))
    float(metrics["loss"])
    dt = (time.perf_counter() - t0) / steps
    # training MFU: fwd + bwd ~ 3x the forward matmul flops (remat adds an
    # extra decoder forward; counted via the remat_factor below)
    from deco_tpu.utils.flops import PEAK_FLOPS, deco_c2i_flops

    fwd = deco_c2i_flops(image_size=res, num_blocks=22 + dec_blocks,
                         num_cond_blocks=22, hidden_x=64)
    remat_factor = 3.0 + (1.0 if remat else 0.0) * (dec_blocks / (22 + dec_blocks))
    train_flops = fwd * remat_factor
    mfu = batch / dt * train_flops / PEAK_FLOPS["v5e"]
    print(f"res={res} batch={batch} remat={remat} policy={remat_policy} "
          f"chunks={decoder_chunks}: {dt*1e3:.1f} ms/step = "
          f"{batch/dt:.1f} img/s  mfu={mfu:.3f}  (compile+1st {compile_s:.1f}s)")


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    r = bool(int(sys.argv[2])) if len(sys.argv) > 2 else True
    d = int(sys.argv[3]) if len(sys.argv) > 3 else 6
    res = int(sys.argv[4]) if len(sys.argv) > 4 else 256
    pol = sys.argv[5] if len(sys.argv) > 5 else "full"
    chunks = int(sys.argv[6]) if len(sys.argv) > 6 else 0
    main(b, r, dec_blocks=d, res=res, remat_policy=pol, decoder_chunks=chunks)
