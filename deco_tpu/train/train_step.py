"""The jitted training step: loss + grad + optimizer + EMA in one XLA program.

TPU-native equivalent of the reference's Lightning ``training_step`` +
backward + DDP all-reduce + AdamW + SimpleEMA pipeline
(``src/lightning_model.py:205-259`` of hhhhzp/DeCo): under pjit the gradient
mean over the data axis is a compiler-inserted collective; EMA is a fused
tree_map; ``diffusion_batch_mul`` replicates latents inside the step so the
(expensive) condition is computed once (lightning_model.py:223-224).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from deco_tpu.train.state import TrainState, ema_update


def make_train_step(
    apply_fn: Callable,
    trainer,
    ema_decay: float = 0.9999,
    ema_every: int = 1,
    diffusion_batch_mul: int = 1,
    grad_clip: Optional[float] = None,
    donate: bool = True,
    accumulate_grad_batches: int = 1,
):
    """Build the jitted train step.

    ``apply_fn(params, x_t, t, y)`` is the bound model forward; ``trainer`` is
    a :mod:`deco_tpu.diffusion.training` objective. Returns
    ``train_step(state, batch, rng) -> (state, metrics)`` where batch is a
    dict with ``x`` (NHWC), ``condition``, ``uncondition``.

    ``accumulate_grad_batches`` > 1 reproduces the reference's
    ``accumulate_grad_batches`` (configs_c2i/DeCo_XL_512.yaml:15): the batch is
    split into k microbatches scanned inside the jitted step — activations for
    one microbatch at a time, gradients averaged, ONE optimizer/EMA update.
    Grad clip applies to the accumulated gradient, matching Lightning's
    clip-at-optimizer-step semantics.
    """

    def loss_fn(params, batch, rng):
        x, cond, uncond = batch["x"], batch["condition"], batch["uncondition"]
        metadata = batch.get("metadata")
        if diffusion_batch_mul > 1:
            reps = lambda a: jnp.concatenate([a] * diffusion_batch_mul, axis=0)
            x, cond, uncond = reps(x), reps(cond), reps(uncond)
            if metadata is not None:
                # the reference replicates only x/condition
                # (lightning_model.py:223-224) because its active-REPA runs
                # never set batch_mul; replicating the feature targets keeps
                # the cos term defined per-copy at batch_mul > 1
                metadata = jax.tree.map(reps, metadata)
        # combined layout {"model":..., "trainer":...} carries trainer-owned
        # trainable state (e.g. the REPA projection); plain pytree = model only
        combined = isinstance(params, dict) and "model" in params
        model_params = params["model"] if combined else params
        trainer_params = params.get("trainer") if combined else None
        net = lambda x_t, t, y, **kw: apply_fn(model_params, x_t, t, y, **kw)
        out = trainer(rng, net, x, cond, uncond, metadata,
                      params=trainer_params)
        return out["loss"], out

    def train_step(state: TrainState, batch, rng):
        if accumulate_grad_batches > 1:
            k = accumulate_grad_batches

            def split(a):
                return a.reshape((k, a.shape[0] // k) + a.shape[1:])

            micro = jax.tree.map(split, batch)

            def body(acc, inp):
                mb, sub_rng = inp
                (_, m), g = jax.value_and_grad(loss_fn, has_aux=True)(
                    state.params, mb, sub_rng
                )
                acc_g, acc_m = acc
                acc_g = jax.tree.map(lambda a, b: a + b / k, acc_g, g)
                acc_m = jax.tree.map(lambda a, b: a + b / k, acc_m, m)
                return (acc_g, acc_m), None

            zeros_g = jax.tree.map(jnp.zeros_like, state.params)
            mb0 = jax.tree.map(lambda a: a[0], micro)
            zero_m = jax.eval_shape(
                lambda p, b, r: loss_fn(p, b, r)[1], state.params, mb0, rng
            )
            zeros_m = jax.tree.map(lambda l: jnp.zeros(l.shape, l.dtype), zero_m)
            (grads, metrics), _ = jax.lax.scan(
                body, (zeros_g, zeros_m),
                (micro, jax.random.split(rng, k)),
            )
        else:
            (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, batch, rng
            )
        if grad_clip is not None:
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, grad_clip / (gnorm + 1e-6))
            grads = jax.tree.map(lambda g: g * scale, grads)
            metrics = dict(metrics, grad_norm=gnorm)
        updates, opt_state = state.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        if state.ema_params is not None:
            decay = jnp.where(state.step % ema_every == 0, ema_decay, 1.0)
            ema_params = ema_update(state.ema_params, params, decay)
        else:
            ema_params = None
        new_state = state.replace(
            step=state.step + 1,
            params=params,
            ema_params=ema_params,
            opt_state=opt_state,
        )
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())
