"""Sampler correctness: integration against closed-form velocity fields,
CFG batching layout, guidance intervals, multistep coefficient behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deco_tpu.diffusion.adam_sampling import AdamLMSampler
from deco_tpu.diffusion.guidance import simple_guidance_fn
from deco_tpu.diffusion.sampling import (
    EulerSampler,
    EulerSamplerJiT,
    HeunSampler,
    shift_respace_fn,
)
from deco_tpu.diffusion.scheduling import LinearScheduler

SHAPE = (2, 8, 8, 3)


def constant_net(value):
    """net(x, t, y) returning a constant velocity field."""

    def net(x, t, y):
        return jnp.full_like(x, value)

    return net


class TestEuler:
    def test_constant_velocity_integrates_exactly(self):
        """With v == c everywhere, x1 = x0 + c (ODE integral over [0,1])."""
        sampler = EulerSampler(
            scheduler=LinearScheduler(), num_steps=8, guidance=1.0,
        )
        noise = jnp.ones(SHAPE) * 0.5
        cond = jnp.zeros((2,), jnp.int32)
        out = sampler(constant_net(2.0), noise, cond, cond)
        np.testing.assert_allclose(out, np.full(SHAPE, 2.5), atol=1e-5)

    def test_linear_flow_exact(self):
        """For v(x,t) = (x1 - x0) (straight-line flow), Euler is exact per step."""
        x1 = jnp.asarray(np.random.RandomState(0).randn(*SHAPE), jnp.float32)

        def net(x, t, y):
            reps = x.shape[0] // SHAPE[0]
            return jnp.tile(x1 - noise, (reps, 1, 1, 1))

        noise = jnp.asarray(np.random.RandomState(1).randn(*SHAPE), jnp.float32)
        sampler = EulerSampler(scheduler=LinearScheduler(), num_steps=4, guidance=1.0)
        out = sampler(net, noise, jnp.zeros((2,)), jnp.zeros((2,)))
        np.testing.assert_allclose(out, x1, atol=1e-5)

    def test_cfg_layout_uncond_first(self):
        """The doubled batch must be [uncond; cond] (guidance.py:3-6)."""
        seen = {}

        def net(x, t, y):
            seen["y"] = y
            return jnp.zeros_like(x)

        # interval (-1, 1] so the t=0 step is guided and the CFG batch is built
        sampler = EulerSampler(scheduler=LinearScheduler(), num_steps=1,
                               guidance=2.0, guidance_interval_min=-1.0)
        cond = jnp.full((2,), 7, jnp.int32)
        uncond = jnp.full((2,), 1000, jnp.int32)
        sampler(net, jnp.zeros(SHAPE), cond, uncond)
        y = np.asarray(seen["y"])
        assert (y[:2] == 1000).all() and (y[2:] == 7).all()

    def test_guidance_interval(self):
        """cfg != 1 only for t in (min, max]; t=0 step always unguided."""
        sampler = EulerSampler(
            scheduler=LinearScheduler(), num_steps=10, guidance=3.2,
            guidance_interval_min=0.1, guidance_interval_max=1.0,
        )
        t = sampler._steps["t"]
        cfg = sampler._steps["cfg"]
        np.testing.assert_allclose(cfg, np.where((t > 0.1) & (t <= 1.0), 3.2, 1.0), rtol=1e-6)
        assert cfg[0] == 1.0

    def test_guided_combination(self):
        """Guided v = u + cfg*(c - u)."""

        def net(x, t, y):
            if x.shape[0] == 2 * SHAPE[0]:  # CFG-doubled call
                b = x.shape[0] // 2
                return jnp.concatenate(
                    [jnp.zeros_like(x[:b]), jnp.ones_like(x[:b])], axis=0
                )
            return jnp.ones_like(x)  # conditional-only call

        sampler = EulerSampler(
            scheduler=LinearScheduler(), num_steps=1, guidance=3.0,
            guidance_interval_min=-1.0,  # make the single t=0 step guided
        )
        out = sampler(net, jnp.zeros(SHAPE), jnp.zeros((2,)), jnp.zeros((2,)))
        # x1 = 0 + 3.0 * dt, dt = 1
        np.testing.assert_allclose(out, np.full(SHAPE, 3.0), atol=1e-5)

    def test_timeshift_respacing(self):
        sampler = EulerSampler(
            scheduler=LinearScheduler(), num_steps=4, guidance=1.0, timeshift=3.0
        )
        expected = shift_respace_fn(
            np.concatenate([np.linspace(0, 0.75, 4), [1.0]]), 3.0
        )
        np.testing.assert_allclose(sampler.timesteps, expected, rtol=1e-6)

    def test_trajectories(self):
        sampler = EulerSampler(scheduler=LinearScheduler(), num_steps=3, guidance=1.0)
        noise = jnp.zeros(SHAPE)
        out, x_trajs, v_trajs = sampler(
            constant_net(1.0), noise, jnp.zeros((2,)), jnp.zeros((2,)),
            return_x_trajs=True, return_v_trajs=True,
        )
        assert x_trajs.shape == (4,) + SHAPE
        assert v_trajs.shape == (4,) + SHAPE
        np.testing.assert_allclose(x_trajs[0], 0.0)
        np.testing.assert_allclose(out, x_trajs[-1])
        np.testing.assert_allclose(v_trajs[-1], 0.0)  # sentinel zeros

    def test_sde_steps_shape_and_finite(self):
        sampler = EulerSampler(
            scheduler=LinearScheduler(), w_scheduler=LinearScheduler(),
            num_steps=5, guidance=1.0, step_fn="sde",
        )
        out = sampler(
            constant_net(0.5), jnp.zeros(SHAPE), jnp.zeros((2,)), jnp.zeros((2,)),
            rng=jax.random.PRNGKey(0),
        )
        assert out.shape == SHAPE
        assert np.isfinite(np.asarray(out)).all()


class TestChunkedDispatch:
    """sample_chunked must be bit-equal to the single-dispatch __call__ —
    same per-step RNG keys and scan bodies; the split only adds step-range
    boundaries (used on-chip where the relay kills >~20s dispatches,
    e.g. 2048px/16,384-token sampling)."""

    def _net(self):
        # a non-trivial net so any step mis-ordering shows: v depends on x, t, y
        def net(x, t, y):
            return -0.3 * x + t[:, None, None, None] + 0.01 * y.astype(
                x.dtype)[:, None, None, None]

        return net

    @pytest.mark.parametrize("num_dispatches", [2, 3, 7])
    def test_matches_single_dispatch(self, num_dispatches):
        sampler = EulerSampler(
            scheduler=LinearScheduler(), num_steps=20, guidance=2.5,
            guidance_interval_min=0.1, guidance_interval_max=0.9,
        )
        noise = jax.random.normal(jax.random.PRNGKey(0), SHAPE)
        cond = jnp.arange(SHAPE[0], dtype=jnp.int32)
        uncond = jnp.full((SHAPE[0],), 7, jnp.int32)
        rng = jax.random.PRNGKey(3)
        ref = sampler(self._net(), noise, cond, uncond, rng)
        got = sampler.sample_chunked(self._net(), noise, cond, uncond, rng,
                                     num_dispatches=num_dispatches)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_sde_path_same_noise_stream(self):
        sampler = EulerSampler(
            scheduler=LinearScheduler(), w_scheduler=LinearScheduler(),
            num_steps=12, guidance=1.5, step_fn="sde",
        )
        noise = jax.random.normal(jax.random.PRNGKey(1), SHAPE)
        cond = jnp.zeros((SHAPE[0],), jnp.int32)
        uncond = jnp.ones((SHAPE[0],), jnp.int32)
        rng = jax.random.PRNGKey(9)
        ref = sampler(self._net(), noise, cond, uncond, rng)
        got = sampler.sample_chunked(self._net(), noise, cond, uncond, rng,
                                     num_dispatches=4)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_adamlm_matches_single_dispatch(self):
        """The ring-buffer history carry must survive dispatch boundaries."""
        sampler = AdamLMSampler(
            scheduler=LinearScheduler(), num_steps=15, order=3,
            guidance=4.0, timeshift=3.0,
            guidance_interval_min=0.1, guidance_interval_max=0.9,
        )
        noise = jax.random.normal(jax.random.PRNGKey(4), SHAPE)
        cond = jnp.arange(SHAPE[0], dtype=jnp.int32)
        uncond = jnp.full((SHAPE[0],), 7, jnp.int32)
        ref = sampler(self._net(), noise, cond, uncond)
        got = sampler.sample_chunked(self._net(), noise, cond, uncond,
                                     num_dispatches=4)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_params_as_arguments_form(self):
        sampler = EulerSampler(scheduler=LinearScheduler(), num_steps=8,
                               guidance=2.0)
        noise = jax.random.normal(jax.random.PRNGKey(2), SHAPE)
        cond = jnp.zeros((SHAPE[0],), jnp.int32)
        uncond = jnp.ones((SHAPE[0],), jnp.int32)
        scale = jnp.asarray(0.7)
        net_p = lambda p, x, t, y: p * self._net()(x, t, y)
        ref = sampler(lambda x, t, y: net_p(scale, x, t, y), noise, cond,
                      uncond)
        got = sampler.sample_chunked(net_p, noise, cond, uncond,
                                     num_dispatches=2, params=scale)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


class TestJiT:
    def test_xpred_recovers_velocity(self):
        """x-pred net returning x1 must yield the same flow as v-pred (x1-x0)/(1-0)."""
        x1 = jnp.asarray(np.random.RandomState(2).randn(*SHAPE), jnp.float32)

        def net(x, t, y):
            reps = x.shape[0] // SHAPE[0]
            return jnp.tile(x1, (reps, 1, 1, 1))

        noise = jnp.zeros(SHAPE)
        sampler = EulerSamplerJiT(
            scheduler=LinearScheduler(), num_steps=50, guidance=1.0
        )
        out = sampler(net, noise, jnp.zeros((2,)), jnp.zeros((2,)))
        np.testing.assert_allclose(out, x1, atol=0.1)


class TestHeun:
    def test_constant_velocity(self):
        sampler = HeunSampler(scheduler=LinearScheduler(), num_steps=4, guidance=1.0)
        out = sampler(
            constant_net(2.0), jnp.zeros(SHAPE), jnp.zeros((2,)), jnp.zeros((2,))
        )
        np.testing.assert_allclose(out, np.full(SHAPE, 2.0), atol=1e-5)

    def test_heun_beats_euler_on_quadratic_flow(self):
        """v(t) = 3t^2 -> x1 = 1 exactly; Heun (2nd order) should beat Euler."""

        def net(x, t, y):
            return jnp.broadcast_to(
                (3 * t**2).reshape(-1, 1, 1, 1), (x.shape[0],) + SHAPE[1:]
            )

        noise = jnp.zeros(SHAPE)
        z = jnp.zeros((2,))
        heun = HeunSampler(scheduler=LinearScheduler(), num_steps=8, guidance=1.0)
        euler = EulerSampler(scheduler=LinearScheduler(), num_steps=8, guidance=1.0)
        err_h = abs(float(heun(net, noise, z, z)[0, 0, 0, 0]) - 1.0)
        err_e = abs(float(euler(net, noise, z, z)[0, 0, 0, 0]) - 1.0)
        assert err_h < err_e
        assert err_h < 0.05  # last step is plain Euler per reference, dominating error


class TestAdamLM:
    def test_order1_equals_euler(self):
        net = constant_net(1.5)
        noise = jnp.zeros(SHAPE)
        z = jnp.zeros((2,))
        adam = AdamLMSampler(scheduler=LinearScheduler(), order=1, num_steps=6,
                             guidance=1.0)
        euler = EulerSampler(scheduler=LinearScheduler(), num_steps=6, guidance=1.0)
        np.testing.assert_allclose(
            adam(net, noise, z, z), euler(net, noise, z, z), atol=1e-5
        )

    def test_coeff_rows_sum_to_one(self):
        adam = AdamLMSampler(scheduler=LinearScheduler(), order=3, num_steps=10,
                             guidance=1.0)
        np.testing.assert_allclose(adam.solver_coeffs.sum(-1), np.ones(10), rtol=1e-5)

    def test_order_annealing(self):
        """Step 0 uses only the newest slot; step k>=order-1 uses all slots."""
        adam = AdamLMSampler(scheduler=LinearScheduler(), order=3, num_steps=10,
                             guidance=1.0)
        assert adam.solver_coeffs[0, 0] == 0 and adam.solver_coeffs[0, 1] == 0
        assert adam.solver_coeffs[0, 2] == 1.0
        assert (adam.solver_coeffs[4] != 0).all()

    def test_order2_beats_euler_on_quadratic_flow(self):
        def net(x, t, y):
            return jnp.broadcast_to(
                (3 * t**2).reshape(-1, 1, 1, 1), (x.shape[0],) + SHAPE[1:]
            )

        noise = jnp.zeros(SHAPE)
        z = jnp.zeros((2,))
        adam = AdamLMSampler(scheduler=LinearScheduler(), order=2, num_steps=8,
                             guidance=1.0)
        euler = EulerSampler(scheduler=LinearScheduler(), num_steps=8, guidance=1.0)
        err_a = abs(float(adam(net, noise, z, z)[0, 0, 0, 0]) - 1.0)
        err_e = abs(float(euler(net, noise, z, z)[0, 0, 0, 0]) - 1.0)
        assert err_a < err_e

    def test_strict_guidance_interval(self):
        """AdamLM uses t < max (strict), unlike Euler's t <= max."""
        adam = AdamLMSampler(
            scheduler=LinearScheduler(), order=2, num_steps=5, guidance=4.0,
            guidance_interval_min=0.0, guidance_interval_max=1.0,
        )
        t = adam.timesteps[:-1]
        expected = np.where((t > 0.0) & (t < 1.0), 4.0, 1.0)
        np.testing.assert_allclose(adam._cfg_per_step, expected, rtol=1e-6)


class TestSamplersJittable:
    @pytest.mark.parametrize("cls,kw", [
        (EulerSampler, {}),
        (HeunSampler, {}),
        (AdamLMSampler, {"order": 2}),
    ])
    def test_jit_compiles_once(self, cls, kw):
        sampler = cls(scheduler=LinearScheduler(), num_steps=4, guidance=2.0, **kw)
        net = constant_net(1.0)

        @jax.jit
        def run(noise):
            return sampler(net, noise, jnp.zeros((2,)), jnp.zeros((2,)))

        out = run(jnp.zeros(SHAPE))
        assert out.shape == SHAPE
