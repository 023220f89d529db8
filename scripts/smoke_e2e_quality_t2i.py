"""End-to-end t2i generative-quality smoke: train -> AdamLM sample -> assert.

The t2i sibling of ``smoke_e2e_quality.py`` (which covers the c2i stack): the
closest in-environment proxy to the reference's GenEval protocol (BASELINE.md
GenEval 0.86 needs the published DeCo-XXL checkpoint + Qwen3 weights, neither
of which can enter this zero-egress image). Train a tiny ``DeCoT2I`` from
scratch where each "prompt" is a fixed random text-embedding sequence (the
shape Qwen3 would produce) mapped to a distinct solid color, then CFG-sample
every prompt with the production AdamLM multistep sampler and assert the
generated images land on their prompt's color with a clean cross-prompt
margin.

This exercises the full t2i production stack — text-refine blocks, joint
image-text attention trunk, SimpleMLPAdaLN pixel decoder, DeCoTrainer CFG
dropout against an uncond embedding, fused AdamW+EMA train step, EMA-weight
sampling, AdamLM order-2 Lagrange multistep with guidance interval
(configs_t2i/sft_res512.yaml:78-86 shape) — and fails loudly if any of it
stops *learning*.

Usage: python scripts/smoke_e2e_quality_t2i.py [steps]
Measured on v5e-1 (8000 steps, batch 256, 121s wall incl. compile): loss
1.428 -> 0.032, per-prompt mean-color error <= 0.006 on the [-1,1] scale,
nearest-wrong-prompt margin >= 1.99.
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

# prompt -> RGB in [-1, 1]
PROMPT_COLORS = np.array(
    [[1.0, -1.0, -1.0],   # "a red square"
     [-1.0, 1.0, -1.0],   # "a green square"
     [-1.0, -1.0, 1.0],   # "a blue square"
     [1.0, 1.0, -1.0]],   # "a yellow square"
    np.float32,
)


def main(steps=8000, batch=256, res=32, lr=2e-3, sample_steps=25, cfg=4.0,
         order=2, seed=0):
    import functools

    import optax

    from deco_tpu.diffusion.adam_sampling import AdamLMSampler
    from deco_tpu.diffusion.scheduling import LinearScheduler
    from deco_tpu.diffusion.training import DeCoTrainer

    from deco_tpu.models.dit_t2i import DeCoT2I

    n_prompts = len(PROMPT_COLORS)
    txt_len, txt_dim = 8, 32
    model = DeCoT2I(
        in_channels=3, patch_size=8, num_groups=4, hidden_size=128,
        decoder_hidden_size=16, num_encoder_blocks=4, num_decoder_blocks=2,
        num_text_blocks=1, txt_embed_dim=txt_dim, txt_max_length=txt_len,
    )
    trainer = DeCoTrainer(
        scheduler=LinearScheduler(), null_condition_p=0.1, lognorm_t=True,
    )
    colors = jnp.asarray(PROMPT_COLORS)

    rng = jax.random.PRNGKey(seed)
    # fixed "text embeddings": what the (frozen) conditioner would emit for
    # each of the n_prompts prompts, plus the cached negative-prompt uncond
    prompt_emb = jax.random.normal(
        jax.random.fold_in(rng, 99), (n_prompts, txt_len, txt_dim))
    uncond_emb = jnp.zeros((txt_len, txt_dim))

    params = model.init(
        rng, jnp.zeros((1, res, res, 3)), jnp.zeros((1,)),
        jnp.zeros((1, txt_len, txt_dim)),
    )
    opt = optax.adamw(lr)

    def synth_batch(key):
        """Prompt-colored images + 5% noise, prompt ids uniform."""
        k1, k2 = jax.random.split(key)
        pid = jax.random.randint(k1, (batch,), 0, n_prompts)
        base = colors[pid][:, None, None, :]
        x = base + 0.05 * jax.random.normal(k2, (batch, res, res, 3))
        return x, prompt_emb[pid]

    uncond_b = jnp.broadcast_to(uncond_emb, (batch, txt_len, txt_dim))

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
                    uncond_b,
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

    # the t2i production sampler shape: AdamLM order 2, guidance interval
    sampler = AdamLMSampler(
        scheduler=LinearScheduler(), order=order, num_steps=sample_steps,
        guidance=cfg, guidance_interval_min=0.0, guidance_interval_max=1.0,
    )
    per_prompt = 16
    pid = jnp.repeat(jnp.arange(n_prompts), per_prompt)
    noise = jax.random.normal(
        jax.random.fold_in(rng, 7), (n_prompts * per_prompt, res, res, 3))
    y_s = prompt_emb[pid]
    uncond_s = jnp.broadcast_to(
        uncond_emb, (n_prompts * per_prompt, txt_len, txt_dim))

    @jax.jit
    def sample(p, noise, y, uy):
        net = lambda xt, t, yy: model.apply(p, xt, t, yy)
        return sampler(net, noise, y, uy)

    imgs = np.asarray(sample(ema, noise, y_s, uncond_s), np.float32)
    total_s = time.perf_counter() - t0

    # per-prompt mean color of the generated batch
    mean_rgb = imgs.reshape(n_prompts, per_prompt, -1, 3).mean(axis=(1, 2))
    err = np.abs(mean_rgb - PROMPT_COLORS).max(axis=1)
    # distance to the NEAREST WRONG prompt color (margin)
    d = np.abs(mean_rgb[:, None, :] - PROMPT_COLORS[None]).max(axis=2)
    wrong = d + np.eye(n_prompts) * 1e9
    margin = wrong.min(axis=1) - err

    first = float(losses[0][:50].mean())
    last = float(losses[-1][-50:].mean())
    print(f"\nloss {first:.4f} -> {last:.4f} over {steps} steps "
          f"({train_s:.1f}s train, {total_s:.1f}s total)")
    for c in range(n_prompts):
        print(f"prompt {c}: mean rgb {np.round(mean_rgb[c], 3)} "
              f"err {err[c]:.3f} margin {margin[c]:.3f}")
    assert last < first * 0.7, "loss did not decrease"
    assert (err < 0.3).all(), f"prompt colors not learned: err={err}"
    assert (margin > 0.5).all(), f"prompts not separated: margin={margin}"
    print("T2I E2E QUALITY SMOKE PASS: every prompt lands on its color with "
          f"margin >= {margin.min():.2f}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8000)
