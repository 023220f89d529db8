"""Flow-matching samplers compiled as single ``lax.scan`` loops.

TPU-native redesign of the reference's per-step Python loops
(``src/diffusion/flow_matching/sampling.py:30-296`` of hhhhzp/DeCo): every
per-step scalar (timestep, dt, scheduler coefficients, guidance scale,
step-function selector coefficients) is precomputed at trace time into stacked
arrays, and sampling runs as one ``lax.scan`` whose body does a single
CFG-doubled network call. The whole sampler jits to one XLA program — no host
round-trips between steps.

Step functions are unified into the family
``x' = x + v*dt + a*(s*w*dt) + b*sqrt(c*w*dt)*eps`` with per-step static
coefficients (a, b, c):

=================  ===========  ==========================================
reference           (a, b, c)    formula (sampling.py:14-24)
=================  ===========  ==========================================
ode_step_fn         (0, 0, 0)    x + v*dt
sde_mean_step_fn    (1, 0, 0)    x + v*dt + s*w*dt
sde_step_fn         (1, 1, 2)    x + v*dt + s*w*dt + sqrt(2*w*dt)*eps
sde_preserve_...    (.5, 1, 1)   x + v*dt + 0.5*s*w*dt + sqrt(w*dt)*eps
=================  ===========  ==========================================

CFG batch layout is ``[uncondition; condition]`` (uncond first), matching
``src/diffusion/base/guidance.py:3-6``.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from deco_tpu.diffusion.guidance import simple_guidance_fn
from deco_tpu.diffusion.scheduling import BaseScheduler

STEP_COEFFS = {
    "ode": (0.0, 0.0, 0.0),
    "sde_mean": (1.0, 0.0, 0.0),
    "sde": (1.0, 1.0, 2.0),
    "sde_preserve": (0.5, 1.0, 1.0),
}


def shift_respace_fn(t, shift=3.0):
    """Timestep respacing t -> t / (t + (1 - t) * shift)."""
    return t / (t + (1 - t) * shift)


class BaseSampler:
    """Common CFG sampling surface (reference base/sampling.py:9-39).

    ``net`` passed to ``__call__`` is a callable ``net(x, t, y)`` already bound
    to parameters; ``x`` is NHWC, ``t`` a (B,) float vector, ``y`` the condition.
    """

    def __init__(
        self,
        scheduler: Optional[BaseScheduler] = None,
        guidance_fn: Callable = simple_guidance_fn,
        num_steps: int = 250,
        guidance: float = 1.0,
        **kwargs,
    ):
        if kwargs:
            # A misspelled kwarg (e.g. guidance_interval= instead of
            # guidance_interval_min/max) silently sampling with the wrong
            # CFG is worse than an error — reject unknown names loudly.
            raise TypeError(
                f"unknown sampler kwargs: {sorted(kwargs)} "
                "(did you mean guidance_interval_min/guidance_interval_max, "
                "timeshift, step_fn, last_step, order, ...?)"
            )
        self.scheduler = scheduler
        self.guidance_fn = guidance_fn
        self.num_steps = num_steps
        self.guidance = guidance

    def _impl_sampling(self, net, noise, condition, uncondition, rng):
        raise NotImplementedError

    # ---- chunked-dispatch support (implemented by Euler/AdamLM samplers) ----

    def _bodies(self, net, batch, noise_dtype, condition, cfg_condition,
                collect):
        raise NotImplementedError

    def _cfg_array(self):
        """The (num_steps,) per-step cfg scales (for _segment_table)."""
        raise NotImplementedError

    def _segment_table(self):
        """Step-index segments [(start, end, kind)] with kind "skip" for the
        contiguous cfg==1 stretches at either end (run conditional-only at
        half cost) and "cfg" for the guidance-interval middle. Interior
        cfg==1 steps (non-contiguous patterns) still go through the CFG
        body, which handles them exactly."""
        cfg_active = np.asarray(self._cfg_array()) != 1.0
        if cfg_active.any():
            lo = int(np.argmax(cfg_active))
            hi = int(len(cfg_active) - np.argmax(cfg_active[::-1]))
        else:
            lo = hi = self.num_steps
        return [
            (0, lo, "skip"),
            (lo, hi, "cfg"),
            (hi, self.num_steps, "skip"),
        ]

    def _scan_steps(self, rng):
        """Per-step scan arrays (dict of (num_steps, ...) leaves)."""
        raise NotImplementedError

    def _init_carry(self, noise):
        return noise

    def _carry_x(self, carry):
        return carry

    def sample_chunked(self, net, noise, condition, uncondition, rng=None,
                       num_dispatches=2, params=None):
        """Run the identical sampling scan as ``num_dispatches`` separately
        jitted+dispatched segments, chaining the carry on-device.

        Bit-equal to ``__call__`` (same per-step RNG keys, same scan bodies —
        the split only moves step-range boundaries, which the single-dispatch
        path already uses for the uncond-skip segments). Use when a serving
        stack caps single-dispatch wall time: e.g. 2048px/16,384-token 50-step
        sampling is a ~90s device program that TPU-relay transports kill,
        while 25-step segments stream through. Trajectories are not collected
        here — use ``__call__`` for ``return_x_trajs``.

        When ``params`` is given, ``net`` must take ``(params, x, t, y)`` and
        the parameters ride as jit *arguments* (closing concrete params into
        the per-segment jits would re-hash/re-upload them per dispatch).
        Pass the *same* ``net`` callable object across calls — the per-segment
        jits are cached on the sampler keyed by (net, segment layout), so a
        fresh lambda per call would retrace every segment every time.
        """
        if num_dispatches < 1:
            # num_dispatches=0 would skip the loop and return raw noise —
            # garbage presented as a sample. Fail loudly instead.
            raise ValueError(
                f"num_dispatches={num_dispatches}: need >= 1 (use the plain "
                "__call__ for a single dispatch)")
        if rng is None:
            rng = jax.random.PRNGKey(0)
        batch = noise.shape[0]
        cfg_condition = jnp.concatenate([uncondition, condition], axis=0)
        steps = self._scan_steps(rng)
        table = self._segment_table()
        bounds = np.linspace(0, self.num_steps, num_dispatches + 1).astype(int)
        jit_cache = getattr(self, "_chunk_jit_cache", None)
        if jit_cache is None:
            jit_cache = self._chunk_jit_cache = {}

        carry = self._init_carry(noise)
        for d in range(num_dispatches):
            lo_d, hi_d = int(bounds[d]), int(bounds[d + 1])
            pieces = [
                (max(s, lo_d), min(e, hi_d), kind)
                for s, e, kind in table
                if min(e, hi_d) > max(s, lo_d)
            ]
            if not pieces:
                continue
            kinds = tuple(kind for _, _, kind in pieces)
            lengths = tuple(e - s for s, e, _ in pieces)
            cache_key = (id(net), params is None, batch, kinds, lengths)
            run_segment = jit_cache.get(cache_key)
            if run_segment is None:

                @jax.jit
                def run_segment(p, carry, cond, cfg_cond, piece_steps,
                                _kinds=kinds):
                    bound = net if params is None else (
                        lambda xt, t, y: net(p, xt, t, y))
                    x0 = self._carry_x(carry)
                    bodies = self._bodies(bound, batch, x0.dtype, cond,
                                          cfg_cond, collect=False)
                    for kind, seg in zip(_kinds, piece_steps):
                        carry, _ = jax.lax.scan(bodies[kind], carry, seg)
                    return carry

                jit_cache[cache_key] = run_segment
                # bound the cache: each jit closure pins its net (and, in
                # params=None mode, any concrete params closed inside it) —
                # a long-lived server cycling nets/batch sizes must not leak
                # executables. FIFO eviction; 32 >> any static serving mix.
                while len(jit_cache) > 32:
                    jit_cache.pop(next(iter(jit_cache)))

            piece_steps = tuple(
                {k: v[s:e] for k, v in steps.items()} for s, e, _ in pieces
            )
            carry = run_segment(params, carry, condition, cfg_condition,
                                piece_steps)
        return self._carry_x(carry)

    def __call__(
        self,
        net,
        noise,
        condition,
        uncondition,
        rng=None,
        return_x_trajs: bool = False,
        return_v_trajs: bool = False,
    ):
        if rng is None:
            rng = jax.random.PRNGKey(0)
        x_trajs, v_trajs = self._impl_sampling(
            net, noise, condition, uncondition, rng,
            collect=return_x_trajs or return_v_trajs,
        )
        if return_x_trajs and return_v_trajs:
            return x_trajs[-1], x_trajs, v_trajs
        elif return_x_trajs:
            return x_trajs[-1], x_trajs
        elif return_v_trajs:
            return x_trajs[-1], v_trajs
        return x_trajs[-1]


class EulerSampler(BaseSampler):
    """Euler ODE/SDE sampler with guidance interval (reference sampling.py:30-107)."""

    def __init__(
        self,
        scheduler: BaseScheduler = None,
        w_scheduler: Optional[BaseScheduler] = None,
        timeshift: float = 1.0,
        guidance_interval_min: float = 0.0,
        guidance_interval_max: float = 1.0,
        step_fn: str = "ode",
        last_step: Optional[float] = None,
        last_step_fn: str = "ode",
        **kwargs,
    ):
        super().__init__(scheduler=scheduler, **kwargs)
        assert self.scheduler is not None
        self.w_scheduler = w_scheduler
        self.timeshift = timeshift
        self.guidance_interval_min = guidance_interval_min
        self.guidance_interval_max = guidance_interval_max
        self.step_type = step_fn
        self.last_step_type = last_step_fn

        if last_step is None or self.num_steps == 1:
            last_step = 1.0 / self.num_steps
        self.last_step = last_step
        assert self.last_step > 0.0
        assert self.w_scheduler is not None or step_fn == "ode"

        timesteps = np.linspace(0.0, 1 - self.last_step, self.num_steps)
        timesteps = np.concatenate([timesteps, [1.0]])
        self.timesteps = shift_respace_fn(timesteps, self.timeshift)
        self._precompute()

    def _precompute(self):
        n = self.num_steps
        ts = jnp.asarray(self.timesteps, dtype=jnp.float32)
        t_cur, t_next = ts[:-1], ts[1:]
        sigma = self.scheduler.sigma(t_cur)
        # 1 / (dalpha/alpha); for LinearScheduler at t=0 this is alpha/dalpha = 0.
        inv_doa = self.scheduler.alpha(t_cur) / self.scheduler.dalpha(t_cur)
        dsm = self.scheduler.dsigma_mul_sigma(t_cur)
        if self.w_scheduler is not None:
            w = self.w_scheduler.w(t_cur)
        else:
            w = jnp.zeros_like(t_cur)
        # Guidance only inside (min, max] — reference sampling.py:93-97.
        in_interval = (np.asarray(t_cur) > self.guidance_interval_min) & (
            np.asarray(t_cur) <= self.guidance_interval_max
        )
        cfg = np.where(in_interval, self.guidance, 1.0)
        a, b, c = np.zeros(n), np.zeros(n), np.zeros(n)
        a[:-1], b[:-1], c[:-1] = STEP_COEFFS[self.step_type]
        a[-1], b[-1], c[-1] = STEP_COEFFS[self.last_step_type]
        self._steps = dict(
            t=np.asarray(t_cur, np.float32),
            dt=np.asarray(t_next - t_cur, np.float32),
            sigma=np.asarray(sigma, np.float32),
            inv_doa=np.asarray(inv_doa, np.float32),
            dsm=np.asarray(dsm, np.float32),
            w=np.asarray(w, np.float32),
            cfg=cfg.astype(np.float32),
            a=a.astype(np.float32),
            b=b.astype(np.float32),
            c=c.astype(np.float32),
        )
        self._needs_noise = bool(np.any(self._steps["b"] != 0))

    def _velocity(self, out, cfg_x, cfg_t):
        """Map raw network output to a velocity field (identity for v-pred)."""
        return out

    def _bodies(self, net, batch, noise_dtype, condition, cfg_condition,
                collect):
        """The two scan bodies (CFG-doubled / uncond-skip), shared by the
        single-dispatch scan and :meth:`sample_chunked` segments."""
        needs_noise = self._needs_noise

        def step_update(x, v, step):
            v = v.astype(x.dtype)
            # score from velocity: s = (inv_doa*v - x) / (sigma^2 - inv_doa*dsm)
            denom = step["sigma"] ** 2 - step["inv_doa"] * step["dsm"]
            denom = jnp.where(denom == 0, 1.0, denom)
            s = (step["inv_doa"] * v - x) / denom
            x_next = x + v * step["dt"] + step["a"] * s * step["w"] * step["dt"]
            if needs_noise:
                eps = jax.random.normal(step["key"], x.shape, x.dtype)
                x_next = x_next + step["b"] * jnp.sqrt(
                    jnp.maximum(step["c"] * step["w"] * step["dt"], 0.0)
                ) * eps
            return x_next

        def body_cfg(x, step):
            cfg_x = jnp.concatenate([x, x], axis=0)
            cfg_t = jnp.full((2 * batch,), step["t"], dtype=noise_dtype)
            out = net(cfg_x, cfg_t, cfg_condition)
            out = self._velocity(out, cfg_x, cfg_t)
            v = self.guidance_fn(out, step["cfg"])
            x_next = step_update(x, v, step)
            return x_next, (x_next, v.astype(x.dtype)) if collect else None

        def body_uncond_skip(x, step):
            # cfg == 1: every reference guidance fn reduces to the conditional
            # branch, so the unconditional half of the batch is dead weight —
            # run conditional-only at half cost (guidance-interval steps,
            # sampling.py:93-97).
            t_vec = jnp.full((batch,), step["t"], dtype=noise_dtype)
            out = net(x, t_vec, condition)
            v = self._velocity(out, x, t_vec)
            x_next = step_update(x, v, step)
            return x_next, (x_next, v.astype(x.dtype)) if collect else None

        return {"cfg": body_cfg, "skip": body_uncond_skip}

    def _cfg_array(self):
        return self._steps["cfg"]

    def _impl_sampling(self, net, noise, condition, uncondition, rng, collect=False):
        batch = noise.shape[0]
        cfg_condition = jnp.concatenate([uncondition, condition], axis=0)
        steps = self._scan_steps(rng)
        bodies = self._bodies(net, batch, noise.dtype, condition,
                              cfg_condition, collect)

        x = noise
        ys_parts = []
        for start, end, kind in self._segment_table():
            if end <= start:
                continue
            seg = {k: v[start:end] for k, v in steps.items()}
            x, ys = jax.lax.scan(bodies[kind], x, seg)
            if collect:
                ys_parts.append(ys)
        if collect:
            xs = jnp.concatenate([p[0] for p in ys_parts], axis=0)
            vs = jnp.concatenate([p[1] for p in ys_parts], axis=0)
            x_trajs = jnp.concatenate([noise[None], xs], axis=0)
            v_trajs = jnp.concatenate([vs, jnp.zeros_like(noise)[None]], axis=0)
            return x_trajs, v_trajs
        return x[None], None

    def _scan_steps(self, rng):
        steps = {k: jnp.asarray(v) for k, v in self._steps.items()}
        steps["key"] = jax.random.split(rng, self.num_steps)
        return steps


class EulerSamplerJiT(EulerSampler):
    """Euler sampler for x-prediction networks (reference sampling.py:109-188).

    The network predicts x1; velocity is recovered as
    ``(out - x_t) / max(1 - t, 5e-2)`` before guidance.
    """

    def _velocity(self, out, cfg_x, cfg_t):
        t = jnp.reshape(cfg_t, (-1,) + (1,) * (out.ndim - 1))
        return (out - cfg_x) / jnp.clip(1.0 - t, min=5e-2)


class HeunSampler(BaseSampler):
    """Heun predictor-corrector sampler (reference sampling.py:190-296).

    Per step: predict with the current velocity estimate (reused from the
    previous correction unless ``exact_heun``), then correct with the velocity
    at the predicted point; the last step is plain Euler.
    """

    def __init__(
        self,
        scheduler: BaseScheduler = None,
        w_scheduler: Optional[BaseScheduler] = None,
        exact_heun: bool = False,
        timeshift: float = 1.0,
        guidance_interval_min: float = 0.0,
        guidance_interval_max: float = 1.0,
        step_fn: str = "ode",
        last_step: Optional[float] = None,
        last_step_fn: str = "ode",
        **kwargs,
    ):
        super().__init__(scheduler=scheduler, **kwargs)
        assert self.scheduler is not None
        self.w_scheduler = w_scheduler
        self.exact_heun = exact_heun
        self.timeshift = timeshift
        self.guidance_interval_min = guidance_interval_min
        self.guidance_interval_max = guidance_interval_max
        self.step_type = step_fn
        self.last_step_type = last_step_fn
        if last_step is None or self.num_steps == 1:
            last_step = 1.0 / self.num_steps
        self.last_step = last_step
        assert self.last_step > 0.0
        timesteps = np.linspace(0.0, 1 - self.last_step, self.num_steps)
        timesteps = np.concatenate([timesteps, [1.0]])
        self.timesteps = shift_respace_fn(timesteps, self.timeshift)
        self._precompute()

    def _precompute(self):
        n = self.num_steps
        ts = jnp.asarray(self.timesteps, dtype=jnp.float32)
        t_cur, t_next = ts[:-1], ts[1:]

        def coeffs(t):
            sigma = self.scheduler.sigma(t)
            inv_doa = self.scheduler.alpha(t) / self.scheduler.dalpha(t)
            dsm = self.scheduler.dsigma_mul_sigma(t)
            return sigma, inv_doa, dsm

        sigma, inv_doa, dsm = coeffs(t_cur)
        sigma_h, inv_doa_h, dsm_h = coeffs(t_next)
        if self.w_scheduler is not None:
            w = self.w_scheduler.w(t_cur)
        else:
            w = jnp.zeros_like(t_cur)
        in_interval = (np.asarray(t_cur) > self.guidance_interval_min) & (
            np.asarray(t_cur) <= self.guidance_interval_max
        )
        cfg = np.where(in_interval, self.guidance, 1.0)
        a, b, c = np.zeros(n), np.zeros(n), np.zeros(n)
        a[:-1], b[:-1], c[:-1] = STEP_COEFFS[self.step_type]
        a[-1], b[-1], c[-1] = STEP_COEFFS[self.last_step_type]
        eval_cur = np.zeros(n, dtype=bool)
        eval_cur[0] = True
        if self.exact_heun:
            eval_cur[:] = True
        correct = np.ones(n, dtype=bool)
        correct[-1] = False
        self._steps = dict(
            t=np.asarray(t_cur, np.float32),
            t_hat=np.asarray(t_next, np.float32),
            dt=np.asarray(t_next - t_cur, np.float32),
            sigma=np.asarray(sigma, np.float32),
            inv_doa=np.asarray(inv_doa, np.float32),
            dsm=np.asarray(dsm, np.float32),
            sigma_h=np.asarray(sigma_h, np.float32),
            inv_doa_h=np.asarray(inv_doa_h, np.float32),
            dsm_h=np.asarray(dsm_h, np.float32),
            w=np.asarray(w, np.float32),
            cfg=cfg.astype(np.float32),
            a=a.astype(np.float32),
            b=b.astype(np.float32),
            c=c.astype(np.float32),
            eval_cur=eval_cur,
            correct=correct,
        )
        self._needs_noise = bool(np.any(self._steps["b"] != 0))

    def _impl_sampling(self, net, noise, condition, uncondition, rng, collect=False):
        batch = noise.shape[0]
        cfg_condition = jnp.concatenate([uncondition, condition], axis=0)
        steps = {k: jnp.asarray(v) for k, v in self._steps.items()}
        steps["key"] = jax.random.split(rng, self.num_steps)
        needs_noise = self._needs_noise

        def guided_v(x, t_scalar, cfg_scale):
            cfg_x = jnp.concatenate([x, x], axis=0)
            cfg_t = jnp.full((2 * batch,), t_scalar, dtype=noise.dtype)
            out = net(cfg_x, cfg_t, cfg_condition)
            return self.guidance_fn(out, cfg_scale).astype(x.dtype)

        def score(v, x, sigma, inv_doa, dsm):
            denom = sigma**2 - inv_doa * dsm
            denom = jnp.where(denom == 0, 1.0, denom)
            return (inv_doa * v - x) / denom

        def step_once(x, v, s, step):
            x_next = x + v * step["dt"] + step["a"] * s * step["w"] * step["dt"]
            if needs_noise:
                eps = jax.random.normal(step["key"], x.shape, x.dtype)
                x_next = x_next + step["b"] * jnp.sqrt(
                    jnp.maximum(step["c"] * step["w"] * step["dt"], 0.0)
                ) * eps
            return x_next

        def body(carry, step):
            x, v_hat, s_hat = carry
            v, s = jax.lax.cond(
                step["eval_cur"],
                lambda: (
                    (lambda vv: (vv, score(vv, x, step["sigma"], step["inv_doa"], step["dsm"])))(
                        guided_v(x, step["t"], step["cfg"])
                    )
                ),
                lambda: (v_hat, s_hat),
            )
            x_hat = step_once(x, v, s, step)

            def do_correct():
                v_h = guided_v(x_hat, step["t_hat"], step["cfg"])
                s_h = score(v_h, x_hat, step["sigma_h"], step["inv_doa_h"], step["dsm_h"])
                v_avg = (v + v_h) / 2
                s_avg = (s + s_h) / 2
                return step_once(x, v_avg, s_avg, step), v_h, s_h, v_avg

            def no_correct():
                return x_hat, v, s, v

            x_next, v_hat_n, s_hat_n, v_used = jax.lax.cond(
                step["correct"], do_correct, no_correct
            )
            return (x_next, v_hat_n, s_hat_n), (x_next, v_used) if collect else None

        init = (noise, jnp.zeros_like(noise), jnp.zeros_like(noise))
        (x_final, _, _), ys = jax.lax.scan(body, init, steps)
        if collect:
            xs, vs = ys
            x_trajs = jnp.concatenate([noise[None], xs], axis=0)
            v_trajs = jnp.concatenate([vs, jnp.zeros_like(noise)[None]], axis=0)
            return x_trajs, v_trajs
        return x_final[None], None
