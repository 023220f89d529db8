"""Benchmark: images/sec/chip, DeCo-XL/16 c2i 256px, 50-step Euler CFG sampler.

The BASELINE.json metric. The reference publishes no throughput numbers
(BASELINE.md) — vs_baseline is reported against a fixed reference constant so
rounds are comparable: the first measured round's throughput is the baseline
(recorded here as REFERENCE_IMG_PER_SEC once established).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

# Use the real TPU when available (JAX_PLATFORMS=axon preset); else CPU smoke.
import jax
import jax.numpy as jnp

# Persistent compile cache: the first DeCo-XL compile over the remote-compile
# tunnel is slow (minutes); cached runs start instantly.
os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# Established on TPU v5e-1 in round 1 (this file, batch 20, 50-step Euler CFG;
# batch sweep: 16->4.33, 18->4.46, 20->4.46 best, 22->4.35, 24->4.33, 28->4.31,
# 32->4.17, 40->4.02, 64->2.78).
REFERENCE_IMG_PER_SEC = 3.161


def main():
    from deco_tpu.diffusion.sampling import EulerSampler
    from deco_tpu.diffusion.scheduling import LinearScheduler
    from deco_tpu.models.dit_c2i_deco import DeCoC2I

    on_tpu = jax.devices()[0].platform != "cpu"
    batch = 20 if on_tpu else 2
    steps = 50 if on_tpu else 2
    size = 256 if on_tpu else 32
    model_kw = dict(
        in_channels=3, patch_size=16, num_groups=16, hidden_size=1152,
        hidden_size_x=32, num_blocks=31, num_cond_blocks=28, num_classes=1000,
    )
    if not on_tpu:  # tiny smoke config off-TPU
        model_kw.update(hidden_size=64, num_groups=4, num_blocks=4,
                        num_cond_blocks=2, hidden_size_x=16, patch_size=8)
    model = DeCoC2I(**model_kw)

    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((batch, size, size, 3), jnp.float32)
    t0 = jnp.zeros((batch,), jnp.float32)
    y0 = jnp.zeros((batch,), jnp.int32)
    params = jax.jit(model.init)(rng, x0, t0, y0)

    sampler = EulerSampler(
        scheduler=LinearScheduler(), num_steps=steps, guidance=3.2,
        guidance_interval_min=0.1, guidance_interval_max=1.0,
    )
    cond = jnp.zeros((batch,), jnp.int32)
    uncond = jnp.full((batch,), 1000 if on_tpu else 10, jnp.int32)

    # params must be a jit ARGUMENT (closing over them bakes ~2.7GB of
    # constants into the program and multiplies compile time).
    @jax.jit
    def sample(params, noise):
        net = lambda x, t, y: model.apply(params, x, t, y)
        return sampler(net, noise, cond, uncond)

    def flops_per_image():
        """XLA's cost model when available, analytic closed form otherwise."""
        from deco_tpu.utils.flops import deco_c2i_flops, sampler_flops_per_image

        analytic = sampler_flops_per_image(
            deco_c2i_flops(
                image_size=size, patch=model_kw["patch_size"],
                hidden=model_kw["hidden_size"],
                num_cond_blocks=model_kw["num_cond_blocks"],
                num_blocks=model_kw["num_blocks"],
                hidden_x=model_kw["hidden_size_x"],
            ),
            num_steps=steps,
            # uncond-skip: steps with t <= interval_min run conditional-only
            cfg_batch_factor=(2 * 0.9 + 1 * 0.1),
        )
        try:
            cost = sample.lower(params, noise).compile().cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            xla_flops = float(cost.get("flops", 0.0)) / batch
            # sanity gate: the axon relay's cost model under-reports by ~500x
            # (measured 4.8e10 vs 2.3e13 analytic); trust XLA only when the
            # two agree within 3x
            if xla_flops > 0 and 1 / 3 <= xla_flops / analytic <= 3:
                return xla_flops, analytic
        except Exception:
            pass
        return analytic, analytic

    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    t0 = time.perf_counter()
    # fresh noise per iteration + host readback per call: the remote-TPU
    # relay elides repeated identical executions and its block_until_ready
    # does not reliably fence, so same-input loops measure nothing.
    float(jnp.sum(sample(params, noise)))  # compile
    print(f"# compile+first run: {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    # >=3 timed dispatches, each with fresh noise + a host readback (the relay
    # elides repeated identical executions); report the mean and the per-iter
    # spread — single-dispatch numbers showed +-5-20% session variance.
    n_iters = 3
    per_iter = []
    for i in range(n_iters):
        noise_i = jax.random.normal(jax.random.PRNGKey(2 + i), x0.shape)
        t_it = time.perf_counter()
        float(jnp.sum(sample(params, noise_i)))
        per_iter.append(time.perf_counter() - t_it)
    img_per_sec = batch * n_iters / sum(per_iter)

    n_chips = jax.device_count()
    value = img_per_sec / n_chips
    iter_rates = sorted(batch / t / n_chips for t in per_iter)

    # MFU against the chip's bf16 peak (BASELINE "speed-of-light" bar):
    # model FLOPs per image x img/s/chip / peak.
    from deco_tpu.utils.flops import PEAK_FLOPS, mfu as mfu_fn

    fpi, fpi_analytic = flops_per_image()
    chip = "v5e" if on_tpu else "cpu"
    mfu = mfu_fn(value, fpi, chip)
    print(f"# flops/image: {fpi:.3e} (analytic {fpi_analytic:.3e}); "
          f"peak {PEAK_FLOPS[chip]:.0f}", file=sys.stderr)
    print(json.dumps({
        "metric": "images_per_sec_per_chip_decoXL_256px_50step",
        "value": round(value, 3),
        "unit": "img/s/chip",
        "vs_baseline": round(value / REFERENCE_IMG_PER_SEC, 3),
        "mfu": round(mfu, 4),
        "flops_per_image": round(fpi, 0),
        "n_iters": n_iters,
        "iter_min": round(iter_rates[0], 3),
        "iter_max": round(iter_rates[-1], 3),
    }))


if __name__ == "__main__":
    main()
