"""DDPM-family samplers (DDIM, VP probability-flow/SDE Euler) as lax.scan.

Parity with reference ``src/diffusion/ddpm/ddim_sampling.py:10-52`` and
``src/diffusion/ddpm/vp_sampling.py:16-70`` (hhhhzp/DeCo). Same TPU design as
:mod:`deco_tpu.diffusion.sampling`: per-step scheduler coefficients are
precomputed at trace time; the loop is one scan with a CFG-doubled net call.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from deco_tpu.diffusion.sampling import BaseSampler
from deco_tpu.diffusion.scheduling import BaseScheduler


class DDIMSampler(BaseSampler):
    """Deterministic DDIM over a discrete-t eps-prediction net."""

    def __init__(self, scheduler: BaseScheduler = None, train_num_steps: int = 1000,
                 **kwargs):
        super().__init__(scheduler=scheduler, **kwargs)
        assert self.scheduler is not None
        self.train_num_steps = train_num_steps
        steps = np.linspace(0.0, train_num_steps - 1, self.num_steps)[::-1].copy()
        self._ts = steps  # descending table timesteps

    def _impl_sampling(self, net, noise, condition, uncondition, rng, collect=False):
        batch = noise.shape[0]
        cfg_condition = jnp.concatenate([uncondition, condition], axis=0)
        ts = jnp.asarray(self._ts, jnp.float32)
        t_cur, t_next = ts[:-1], ts[1:]
        steps = dict(
            t=t_cur,
            alpha=self.scheduler.alpha(t_cur),
            sigma=self.scheduler.sigma(t_cur),
            alpha_next=self.scheduler.alpha(t_next),
            sigma_next=self.scheduler.sigma(t_next),
        )

        def body(x, step):
            cfg_x = jnp.concatenate([x, x], axis=0)
            cfg_t = jnp.full((2 * batch,), step["t"], dtype=noise.dtype)
            out = net(cfg_x, cfg_t, cfg_condition)
            eps = self.guidance_fn(out, self.guidance).astype(x.dtype)
            x0 = (x - step["sigma"] * eps) / step["alpha"]
            x = step["alpha_next"] * x0 + step["sigma_next"] * eps
            return x, (x, eps) if collect else None

        x_final, ys = jax.lax.scan(body, noise, steps)
        if collect:
            xs, vs = ys
            return (
                jnp.concatenate([noise[None], xs], axis=0),
                jnp.concatenate([vs, jnp.zeros_like(noise)[None]], axis=0),
            )
        return x_final[None], None


class VPEulerSampler(BaseSampler):
    """Probability-flow ODE / reverse SDE Euler for continuous VP models.

    step: ``x' = x + (-0.5*beta*x + k*eps*beta/sigma)*dt [+ sqrt(|dt|*beta)*z]``
    with k=0.5 (ODE) or k=1 + noise (SDE); time runs 1 -> 0. The final step
    integrates to t=0 with the (deterministic) last_step_fn.
    """

    def __init__(
        self,
        scheduler: BaseScheduler = None,
        train_max_t: int = 1000,
        step_fn: str = "ode",
        last_step: Optional[float] = None,
        last_step_fn: str = "ode",
        **kwargs,
    ):
        super().__init__(scheduler=scheduler, **kwargs)
        assert self.scheduler is not None
        self.train_max_t = train_max_t
        self.step_type = step_fn
        self.last_step_type = last_step_fn
        if last_step is None or self.num_steps == 1:
            last_step = 1.0 / self.num_steps
        self.last_step = last_step
        assert self.last_step > 0.0
        steps = np.concatenate(
            [np.linspace(1.0, self.last_step, self.num_steps), [0.0]]
        )
        self._ts = steps
        n = self.num_steps
        k = np.full(n, 0.5 if step_fn == "ode" else 1.0)
        b = np.zeros(n) if step_fn == "ode" else np.ones(n)
        k[-1] = 0.5 if last_step_fn == "ode" else 1.0
        b[-1] = 0.0  # last step deterministic per reference
        self._k, self._b = k, b

    def _impl_sampling(self, net, noise, condition, uncondition, rng, collect=False):
        batch = noise.shape[0]
        cfg_condition = jnp.concatenate([uncondition, condition], axis=0)
        ts = jnp.asarray(self._ts, jnp.float32)
        t_cur, t_next = ts[:-1], ts[1:]
        steps = dict(
            t=t_cur,
            dt=t_next - t_cur,
            sigma=self.scheduler.sigma(t_cur),
            beta=self.scheduler.beta(t_cur),
            k=jnp.asarray(self._k, jnp.float32),
            b=jnp.asarray(self._b, jnp.float32),
            key=jax.random.split(rng, self.num_steps),
        )
        needs_noise = bool(np.any(self._b != 0))

        def body(x, step):
            cfg_x = jnp.concatenate([x, x], axis=0)
            cfg_t = jnp.full((2 * batch,), step["t"] * self.train_max_t,
                             dtype=noise.dtype)
            out = net(cfg_x, cfg_t, cfg_condition)
            eps = self.guidance_fn(out, self.guidance).astype(x.dtype)
            drift = -0.5 * step["beta"] * x + step["k"] * eps * step["beta"] / step["sigma"]
            x_next = x + drift * step["dt"]
            if needs_noise:
                z = jax.random.normal(step["key"], x.shape, x.dtype)
                x_next = x_next + step["b"] * jnp.sqrt(
                    jnp.abs(step["dt"]) * step["beta"]
                ) * z
            return x_next, (x_next, eps) if collect else None

        x_final, ys = jax.lax.scan(body, noise, steps)
        if collect:
            xs, vs = ys
            return (
                jnp.concatenate([noise[None], xs], axis=0),
                jnp.concatenate([vs, jnp.zeros_like(noise)[None]], axis=0),
            )
        return x_final[None], None
