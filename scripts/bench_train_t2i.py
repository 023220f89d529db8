"""t2i training-step probe: DeCo-XXL/16 (1.1B) on one v5e chip.

Usage: python scripts/bench_train_t2i.py [batch] [res] [ema:0/1] [opt] [chunks]

opt: adamw (reference-exact) | adamw-bf16mu (bf16 first moment) |
adafactor (factored second moment, no momentum — the standard large-model
memory optimizer; a documented deviation, not the reference default).

Structural context: the XXL fp32 TrainState is params + EMA + two AdamW
moments = 4 x 4.4 GB = 17.6 GB > 16 GB HBM, so the reference-exact state
CANNOT fit single-chip — fsdp over the mesh `model` axis is the intended
path (the state divides; proven functionally on the virtual mesh,
tests/test_trunk_parallel_model.py + dryrun_multichip). This probe measures
what DOES fit single-chip under explicit, documented deviations:
ema=0 drops the EMA stream (13.2 GB state), mu=bf16 halves the first
moment (optax mu_dtype — the widely used memory knob; second moment and
params stay fp32). Reference trains this model multi-node DDP
(train.sh:22-23) and never publishes a single-accelerator number.
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


def main(batch=1, res=256, ema=True, opt="adamw", steps=4,
         decoder_chunks=0):
    import optax

    from deco_tpu.config.registry import instantiate, load_yaml
    from deco_tpu.diffusion.scheduling import LinearScheduler
    from deco_tpu.diffusion.training import DeCoTrainer
    from deco_tpu.train.state import TrainState
    from deco_tpu.train.train_step import make_train_step

    cfg = load_yaml("/root/repo/configs_t2i/sft_res512.yaml")
    dn = dict(cfg["model"]["denoiser"]["init_args"])
    dn["grad_checkpoint"] = True
    if decoder_chunks:
        dn["decoder_chunks"] = decoder_chunks
    cfg["model"]["denoiser"]["init_args"] = dn
    model = instantiate(cfg["model"]["denoiser"])
    trainer = DeCoTrainer(scheduler=LinearScheduler(), lognorm_t=True,
                          timeshift=4.0, null_condition_p=0.1)

    txt_len, txt_dim = 128, 2048
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((batch, res, res, 3), jnp.float32)
    t = jnp.zeros((batch,), jnp.float32)
    y = jnp.zeros((batch, txt_len, txt_dim), jnp.float32)
    variables = jax.jit(model.init)(rng, x, t, y)
    n_params = sum(p.size for p in jax.tree.leaves(variables))
    print(f"params: {n_params/1e9:.2f}B ({n_params*4/2**30:.1f} GiB fp32)")

    if opt == "adafactor":
        tx = optax.adafactor(1e-5)
    else:
        mu = jnp.bfloat16 if opt == "adamw-bf16mu" else None
        tx = optax.adamw(1e-5, weight_decay=0.0, mu_dtype=mu)
    state = TrainState.create(params=variables, tx=tx, ema=ema)
    step_fn = make_train_step(
        lambda p, xt, tt, yy, **kw: model.apply(p, xt, tt, yy, **kw),
        trainer, grad_clip=1.0)

    data = np.random.RandomState(0).randn(batch, res, res, 3).astype(np.float32)
    cond = np.random.RandomState(1).randn(
        batch, txt_len, txt_dim).astype(np.float32)
    mk = lambda i: {"x": jnp.asarray(data + i * 1e-3),
                    "condition": jnp.asarray(cond),
                    "uncondition": jnp.zeros_like(cond)}
    t0 = time.perf_counter()
    state, metrics = step_fn(state, mk(0), jax.random.PRNGKey(1))
    loss0 = float(metrics["loss"])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(steps):
        state, metrics = step_fn(state, mk(i + 1), jax.random.PRNGKey(2 + i))
    float(metrics["loss"])
    dt = (time.perf_counter() - t0) / steps
    print(f"t2i train res={res} batch={batch} ema={ema} opt={opt} "
          f"chunks={decoder_chunks}: "
          f"{dt*1e3:.1f} ms/step = {batch/dt:.2f} img/s  loss0={loss0:.3f} "
          f"(compile+1st {compile_s:.1f}s)")


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    r = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    e = bool(int(sys.argv[3])) if len(sys.argv) > 3 else True
    m = sys.argv[4] if len(sys.argv) > 4 else "adamw"
    c = int(sys.argv[5]) if len(sys.argv) > 5 else 0
    main(b, r, ema=e, opt=m, decoder_chunks=c)
