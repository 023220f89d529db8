"""End-to-end generative-quality smoke: train -> sample -> assert.

The closest in-environment proxy to the reference's FID protocol (BASELINE.md
FID 1.62 needs published weights + ImageNet, neither of which can enter this
zero-egress image): train a tiny DeCo c2i from scratch on a synthetic
class-conditional dataset (each class is a distinct solid color + noise),
then CFG-sample every class with the production Euler sampler and assert the
generated images land on their class colors with a clean cross-class margin.

This exercises the full production stack — DeCoTrainer (lognorm-t mix, CFG
dropout), fused AdamW+EMA train step, EMA-weight sampling, CFG guidance
interval — and fails loudly if any of it stops *learning*.

Usage: python scripts/smoke_e2e_quality.py [steps]
Measured on v5e-1 (8000 steps, batch 256, 138s wall incl. compile): loss
1.443 -> 0.031, per-class mean-color error <= 0.018 on the [-1,1] scale,
nearest-wrong-class margin >= 1.97. At 2000 steps the classes already
separate (margin > 1.1) but colors retain 0.3-0.45 residue — train the
full 8000.
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

# class -> RGB in [-1, 1]
CLASS_COLORS = np.array(
    [[1.0, -1.0, -1.0],   # red
     [-1.0, 1.0, -1.0],   # green
     [-1.0, -1.0, 1.0],   # blue
     [1.0, 1.0, -1.0]],   # yellow
    np.float32,
)


def main(steps=8000, batch=256, res=32, lr=2e-3, sample_steps=50, cfg=2.0,
         seed=0):
    import optax

    from deco_tpu.diffusion.sampling import EulerSampler
    from deco_tpu.diffusion.scheduling import LinearScheduler
    from deco_tpu.diffusion.training import DeCoTrainer

    from deco_tpu.models.dit_c2i_deco import DeCoC2I

    n_classes = len(CLASS_COLORS)
    model = DeCoC2I(
        in_channels=3, patch_size=8, num_groups=4, hidden_size=128,
        hidden_size_x=16, num_blocks=6, num_cond_blocks=4,
        num_classes=n_classes,
    )
    trainer = DeCoTrainer(
        scheduler=LinearScheduler(), null_condition_p=0.1, lognorm_t=True,
    )
    colors = jnp.asarray(CLASS_COLORS)

    rng = jax.random.PRNGKey(seed)
    params = model.init(
        rng, jnp.zeros((1, res, res, 3)), jnp.zeros((1,)),
        jnp.zeros((1,), jnp.int32),
    )
    opt = optax.adamw(lr)

    def synth_batch(key):
        """Class-colored images + 5% noise, labels uniform."""
        k1, k2 = jax.random.split(key)
        y = jax.random.randint(k1, (batch,), 0, n_classes)
        base = colors[y][:, None, None, :]
        x = base + 0.05 * jax.random.normal(k2, (batch, res, res, 3))
        return x, y

    import functools

    @functools.partial(jax.jit, static_argnums=4)
    def train_many(params, opt_state, ema, key, n):
        """n fused train steps as one scan — data synthesized on-device."""

        def step(carry, k):
            params, opt_state, ema = carry
            kd, kt = jax.random.split(k)
            x, y = synth_batch(kd)

            def loss_fn(p):
                out = trainer(
                    kt, lambda xt, t, yy: model.apply(p, xt, t, yy), x, y,
                    jnp.full_like(y, n_classes),
                )
                return jnp.mean(out["loss"])

            loss, g = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(g, opt_state, params)
            params = optax.apply_updates(params, updates)
            ema = jax.tree.map(lambda e, p: 0.999 * e + 0.001 * p, ema, params)
            return (params, opt_state, ema), loss

        keys = jax.random.split(key, n)
        (params, opt_state, ema), losses = jax.lax.scan(
            step, (params, opt_state, ema), keys)
        return params, opt_state, ema, losses

    opt_state = opt.init(params)
    ema = params
    t0 = time.perf_counter()
    seg = 500
    losses = []
    for i in range(0, steps, seg):
        n = min(seg, steps - i)
        params, opt_state, ema, ls = train_many(
            params, opt_state, ema, jax.random.fold_in(rng, 1000 + i), n)
        losses.append(np.asarray(ls))
        print(f"step {i + n:5d}: loss {float(ls[-50:].mean()):.4f}",
              flush=True)
    train_s = time.perf_counter() - t0

    sampler = EulerSampler(
        scheduler=LinearScheduler(), num_steps=sample_steps, guidance=cfg,
        guidance_interval_min=0.1, guidance_interval_max=1.0,
    )
    per_class = 16
    y = jnp.repeat(jnp.arange(n_classes), per_class)
    noise = jax.random.normal(
        jax.random.fold_in(rng, 7), (n_classes * per_class, res, res, 3))

    @jax.jit
    def sample(p, noise, y):
        net = lambda xt, t, yy: model.apply(p, xt, t, yy)
        return sampler(net, noise, y, jnp.full_like(y, n_classes))

    imgs = np.asarray(sample(ema, noise, y), np.float32)
    total_s = time.perf_counter() - t0

    # per-class mean color of the generated batch
    mean_rgb = imgs.reshape(n_classes, per_class, -1, 3).mean(axis=(1, 2))
    err = np.abs(mean_rgb - CLASS_COLORS).max(axis=1)
    # distance to the NEAREST WRONG class color (margin)
    d = np.abs(mean_rgb[:, None, :] - CLASS_COLORS[None]).max(axis=2)
    wrong = d + np.eye(n_classes) * 1e9
    margin = wrong.min(axis=1) - err

    first = float(losses[0][:50].mean())
    last = float(losses[-1][-50:].mean())
    print(f"\nloss {first:.4f} -> {last:.4f} over {steps} steps "
          f"({train_s:.1f}s train, {total_s:.1f}s total)")
    for c in range(n_classes):
        print(f"class {c}: mean rgb {np.round(mean_rgb[c], 3)} "
              f"err {err[c]:.3f} margin {margin[c]:.3f}")
    assert last < first * 0.7, "loss did not decrease"
    assert (err < 0.3).all(), f"class colors not learned: err={err}"
    assert (margin > 0.5).all(), f"classes not separated: margin={margin}"
    print("E2E QUALITY SMOKE PASS: every class lands on its color with "
          f"margin >= {margin.min():.2f}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8000)
