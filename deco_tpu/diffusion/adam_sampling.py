"""Adams-Lagrange linear multistep sampler as a single ``lax.scan``.

Parity with reference ``src/diffusion/flow_matching/adam_sampling.py:39-121``
(hhhhzp/DeCo): order-k (k<=4) multistep whose per-step coefficients are
precomputed at trace time by integrating the Lagrange interpolation of past
velocity predictions over each ``[t_i, t_{i+1}]`` interval (optionally in a
transformed time coordinate: SNR / logSNR / inverse-SNR).

TPU-native design: the velocity-prediction history lives in a fixed-size
``(order, ...)`` ring buffer carried through the scan; per-step coefficients are
a static ``(num_steps, order)`` matrix (zero-padded on the left for early steps
where the effective order anneals to ``min(order, i+1)``), so the weighted
combination is one einsum regardless of step index.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from deco_tpu.diffusion.pre_integral import lagrange_preint
from deco_tpu.diffusion.sampling import BaseSampler, shift_respace_fn
from deco_tpu.diffusion.scheduling import BaseScheduler


def t2snr(t):
    t = max(float(t), 1e-8)
    return t / (1 - t + 1e-8)


def t2logsnr(t):
    t = max(float(t), 1e-3)
    return math.log(t / (1 - t + 1e-3))


def t2isnr(t):
    return 1.0 / t2snr(t)


def nop(t):
    return float(t)


LMS_TRANSFORMS = {"nop": nop, "snr": t2snr, "logsnr": t2logsnr, "isnr": t2isnr}


class AdamLMSampler(BaseSampler):
    """Adams-Lagrange multistep ODE sampler (the t2i production sampler)."""

    def __init__(
        self,
        scheduler: BaseScheduler = None,
        order: int = 2,
        timeshift: float = 1.0,
        guidance_interval_min: float = 0.0,
        guidance_interval_max: float = 1.0,
        lms_transform_fn="nop",
        last_step: Optional[float] = None,
        **kwargs,
    ):
        super().__init__(scheduler=scheduler, **kwargs)
        assert self.scheduler is not None
        self.order = order
        self.guidance_interval_min = guidance_interval_min
        self.guidance_interval_max = guidance_interval_max
        if isinstance(lms_transform_fn, str):
            lms_transform_fn = LMS_TRANSFORMS[lms_transform_fn]
        self.lms_transform_fn = lms_transform_fn

        if last_step is None:
            last_step = 1.0 / self.num_steps
        self.last_step = last_step
        timesteps = np.linspace(0.0, 1 - self.last_step, self.num_steps)
        timesteps = np.concatenate([timesteps, [1.0]])
        self.timesteps = shift_respace_fn(timesteps, timeshift)
        self.timedeltas = self.timesteps[1:] - self.timesteps[:-1]
        self._reparameterize_coeffs()

    def _reparameterize_coeffs(self):
        """Coefficient matrix (num_steps, order), newest prediction in the last slot.

        Mirrors reference adam_sampling.py:71-84: at step i the effective order
        is min(order, i+1); Lagrange-basis integrals over the (possibly
        transformed) time coordinate are normalized to sum to 1.
        """
        coeff_rows = np.zeros((self.num_steps, self.order), dtype=np.float64)
        for i in range(self.num_steps):
            pre_vs = [1.0] * (i + 1)
            pre_ts = [self.lms_transform_fn(t) for t in self.timesteps[: i + 1]]
            int_t_start = self.lms_transform_fn(self.timesteps[i])
            int_t_end = self.lms_transform_fn(self.timesteps[i + 1])
            order = min(self.order, i + 1)
            _, coeffs = lagrange_preint(order, pre_vs, pre_ts, int_t_start, int_t_end)
            # coeffs are ordered oldest..newest over the last `order` preds;
            # right-align into the fixed-width row (older slots left, zero-pad).
            coeff_rows[i, self.order - len(coeffs):] = np.asarray(coeffs)
        self.solver_coeffs = coeff_rows.astype(np.float32)
        # guidance interval: strict on both ends here (reference :105, `<` not `<=`)
        t_cur = self.timesteps[:-1]
        in_interval = (t_cur > self.guidance_interval_min) & (
            t_cur < self.guidance_interval_max
        )
        self._cfg_per_step = np.where(in_interval, self.guidance, 1.0).astype(np.float32)

    def _scan_steps(self, rng):
        del rng  # ODE multistep — no per-step noise
        return dict(
            t=jnp.asarray(self.timesteps[:-1], jnp.float32),
            dt=jnp.asarray(self.timedeltas, jnp.float32),
            cfg=jnp.asarray(self._cfg_per_step),
            coeffs=jnp.asarray(self.solver_coeffs),
        )

    def _cfg_array(self):
        return self._cfg_per_step

    def _init_carry(self, noise):
        history0 = jnp.zeros((self.order,) + noise.shape, noise.dtype)
        return (noise, history0)

    def _carry_x(self, carry):
        return carry[0]

    def _bodies(self, net, batch, noise_dtype, condition, cfg_condition,
                collect):
        def advance(carry, pred, step):
            x, history = carry
            # push newest prediction into the last ring-buffer slot
            history = jnp.concatenate([history[1:], pred[None]], axis=0)
            v = jnp.einsum("k,k...->...", step["coeffs"].astype(x.dtype), history)
            x = x + v * step["dt"]
            return (x, history), v

        def body_cfg(carry, step):
            x = carry[0]
            cfg_x = jnp.concatenate([x, x], axis=0)
            cfg_t = jnp.full((2 * batch,), step["t"], dtype=noise_dtype)
            out = net(cfg_x, cfg_t, cfg_condition)
            pred = self.guidance_fn(out, step["cfg"]).astype(x.dtype)
            carry, v = advance(carry, pred, step)
            return carry, (carry[0], v) if collect else None

        def body_uncond_skip(carry, step):
            # cfg == 1 steps (t=0 first step, interval edges): guidance
            # reduces to the conditional branch — half-cost net call
            x = carry[0]
            t_vec = jnp.full((batch,), step["t"], dtype=noise_dtype)
            pred = net(x, t_vec, condition).astype(x.dtype)
            carry, v = advance(carry, pred, step)
            return carry, (carry[0], v) if collect else None

        return {"cfg": body_cfg, "skip": body_uncond_skip}

    def _impl_sampling(self, net, noise, condition, uncondition, rng,
                       collect=False):
        batch = noise.shape[0]
        cfg_condition = jnp.concatenate([uncondition, condition], axis=0)
        steps = self._scan_steps(rng)
        bodies = self._bodies(net, batch, noise.dtype, condition,
                              cfg_condition, collect)
        carry = self._init_carry(noise)
        ys_parts = []
        for start, end, kind in self._segment_table():
            if end <= start:
                continue
            seg = {k: v[start:end] for k, v in steps.items()}
            carry, ys = jax.lax.scan(bodies[kind], carry, seg)
            if collect:
                ys_parts.append(ys)
        x_final = carry[0]
        if collect:
            xs = jnp.concatenate([p[0] for p in ys_parts], axis=0)
            vs = jnp.concatenate([p[1] for p in ys_parts], axis=0)
            x_trajs = jnp.concatenate([noise[None], xs], axis=0)
            v_trajs = jnp.concatenate([vs, jnp.zeros_like(noise)[None]], axis=0)
            return x_trajs, v_trajs
        return x_final[None], None
