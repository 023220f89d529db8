#!/usr/bin/env python
"""UniFlow smoke test (reference test_vlm.py equivalent).

Loads a UniFlow model (fresh init or an Orbax checkpoint), runs semantic
reconstruction on an example image, prints the distillation loss and an ASCII
loss curve over a few adaptation steps.
"""

# runnable as `python scripts/<name>.py` from anywhere
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image", default=None, help="path to an RGB image")
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--size", type=int, default=112)
    args = p.parse_args()

    from deco_tpu.models.uniflow import UniFlowConfig, UniFlowVision

    cfg = UniFlowConfig(
        vit_hidden_size=64, llm_hidden_size=48, num_hidden_layers=3,
        num_attention_heads=4, intermediate_size=128, patch_size=14,
        image_size=args.size, global_blocks_depth=2, num_decoder_layers=2,
        num_sampling_steps=4,
    )
    model = UniFlowVision(cfg, dtype=jnp.float32)
    if args.image:
        from PIL import Image

        img = Image.open(args.image).convert("RGB").resize((args.size, args.size))
        x = jnp.asarray(np.array(img), jnp.float32)[None] / 127.5 - 1.0
    else:
        x = jax.random.uniform(jax.random.PRNGKey(0), (1, args.size, args.size, 3),
                               minval=-1, maxval=1)
    rng = jax.random.PRNGKey(1)
    params = model.init({"params": rng}, x, rng, method=model.forward_loss)

    import optax

    tx = optax.adam(1e-4)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, rng):
        def loss(p):
            out = model.apply(p, x, rng, method=model.forward_loss)
            return out["loss"], out

        (l, out), g = jax.value_and_grad(loss, has_aux=True)(params)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(params, up), opt, out

    losses = []
    for i in range(args.steps):
        params, opt, out = step(params, opt, jax.random.fold_in(rng, i))
        losses.append(float(out["distill_loss"]))
        print(f"step {i}: distill={losses[-1]:.4f} "
              f"sem={float(out['sem_mse_loss']):.4f} "
              f"flow={float(out['flow_loss']):.4f}")
    # ASCII loss curve (test_vlm.py style)
    lo, hi = min(losses), max(losses)
    span = max(hi - lo, 1e-8)
    print("\ndistill loss curve:")
    for i, l in enumerate(losses):
        bar = int((l - lo) / span * 40)
        print(f"{i:3d} | {'#' * bar}{' ' * (40 - bar)} {l:.4f}")
    sem = model.apply(params, x, jax.random.PRNGKey(9), mode="semantic")
    print(f"\nsemantic reconstruction: {sem.shape}, finite="
          f"{bool(np.isfinite(np.asarray(sem)).all())}")


if __name__ == "__main__":
    main()
