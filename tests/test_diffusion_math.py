"""Unit tests for the pure diffusion math layer (SURVEY.md §4: test the math
the reference never tested — schedulers against closed forms, Lagrange
coefficients against quadrature, DCT orthonormality)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deco_tpu.diffusion import pre_integral, scheduling
from deco_tpu.diffusion.training import time_shift_fn
from deco_tpu.ops import block_dct


class TestSchedulers:
    def test_linear(self):
        s = scheduling.LinearScheduler()
        t = jnp.array([0.0, 0.3, 1.0])
        np.testing.assert_allclose(s.alpha(t), t)
        np.testing.assert_allclose(s.sigma(t), 1 - t)
        np.testing.assert_allclose(s.dalpha(t), np.ones(3))
        np.testing.assert_allclose(s.dsigma(t), -np.ones(3))
        np.testing.assert_allclose(s.w(t), 1 - t)

    def test_gvp_boundary(self):
        s = scheduling.GVPScheduler()
        t = jnp.array([0.0, 1.0])
        np.testing.assert_allclose(s.alpha(t), [1.0, 0.0], atol=1e-7)
        np.testing.assert_allclose(s.sigma(t), [0.0, 1.0], atol=1e-7)

    def test_gvp_derivative_consistency(self):
        """Reference quirk: GVP dalpha/dsigma omit the pi/2 chain-rule factor
        (scheduling.py:23-27 uses -sin/cos directly). Assert d* = (2/pi) * d/dt."""
        s = scheduling.GVPScheduler()
        t = jnp.linspace(0.1, 0.9, 9)
        eps = 1e-4
        fd_alpha = (s.alpha(t + eps) - s.alpha(t - eps)) / (2 * eps)
        fd_sigma = (s.sigma(t + eps) - s.sigma(t - eps)) / (2 * eps)
        np.testing.assert_allclose(s.dalpha(t), fd_alpha * 2 / math.pi, atol=2e-3)
        np.testing.assert_allclose(s.dsigma(t), fd_sigma * 2 / math.pi, atol=2e-3)

    def test_interpolant_variance_preserving_gvp(self):
        s = scheduling.GVPScheduler()
        t = jnp.linspace(0, 1, 11)
        np.testing.assert_allclose(s.alpha(t) ** 2 + s.sigma(t) ** 2, np.ones(11), atol=1e-6)

    def test_vp_scheduler(self):
        s = scheduling.VPScheduler()
        t = jnp.array([0.5])
        ib = 0.5 * (20 - 0.1) * 0.25 + 0.1 * 0.5
        np.testing.assert_allclose(s.alpha(t), [math.exp(-0.5 * ib)], rtol=1e-5)
        np.testing.assert_allclose(s.sigma(t), [math.sqrt(1 - math.exp(-ib))], rtol=1e-5)
        # clamp at t < 1e-3
        np.testing.assert_allclose(s.alpha(jnp.array([0.0])), s.alpha(jnp.array([1e-3])))

    def test_ddpm_table(self):
        s = scheduling.DDPMScheduler(num_steps=10)
        t = jnp.arange(10)
        betas = np.linspace(0.0001, 0.02, 10)
        alphas = np.cumprod(1 - betas)
        np.testing.assert_allclose(s.alpha(t), np.sqrt(alphas), rtol=1e-5)
        np.testing.assert_allclose(s.sigma(t), np.sqrt(1 - alphas), rtol=2e-4)

    def test_timeshift(self):
        t = jnp.array([0.0, 0.5, 1.0])
        np.testing.assert_allclose(time_shift_fn(t, 1.0), t)
        np.testing.assert_allclose(time_shift_fn(t, 3.0), [0.0, 0.25, 1.0])


class TestLagrange:
    def test_o1_is_euler(self):
        val, coeffs = pre_integral.lagrange_preint(1, [2.0], [0.0], 0.0, 0.1)
        assert coeffs == (1.0,)
        np.testing.assert_allclose(val, 0.2)

    def test_coeffs_sum_to_one(self):
        ts = [0.0, 0.1, 0.25, 0.45]
        for order in (1, 2, 3, 4):
            _, coeffs = pre_integral.lagrange_preint(
                order, [1.0] * 4, ts, 0.45, 0.6
            )
            np.testing.assert_allclose(sum(coeffs), 1.0, rtol=1e-12)

    @pytest.mark.parametrize("order", [1, 2, 3, 4])
    def test_exact_for_polynomials(self, order):
        """Order-k Lagrange pre-integration integrates degree-(k-1) polys exactly."""
        rng = np.random.RandomState(0)
        poly = rng.randn(order)  # coefficients of degree order-1 polynomial
        ts = np.array([0.05, 0.2, 0.4, 0.55][:order])
        vs = [float(np.polyval(poly[::-1], t)) for t in ts]
        a, b = 0.55, 0.8
        val, _ = pre_integral.lagrange_preint(order, list(vs), list(ts), a, b)
        exact = pre_integral.polynomial_integral(list(poly), a, b)
        np.testing.assert_allclose(val, exact, rtol=1e-9)


class TestDCT:
    def test_dct_matrix_orthonormal(self):
        c = block_dct.dct_matrix(8)
        np.testing.assert_allclose(c @ c.T, np.eye(8), atol=1e-6)

    def test_kron_matches_separable(self):
        rng = np.random.RandomState(0)
        x = rng.randn(8, 8).astype(np.float32)
        c = block_dct.dct_matrix(8)
        expected = c @ x @ c.T
        d = block_dct.dct_kron_matrix(8)
        got = (d @ x.reshape(64)).reshape(8, 8)
        np.testing.assert_allclose(got, expected, atol=1e-5)

    def test_block_dct_roundtrip(self):
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(2, 16, 24, 3), jnp.float32)
        f = block_dct.block_dct_8x8(x)
        back = block_dct.block_idct_8x8(f)
        np.testing.assert_allclose(back, x, atol=1e-5)

    def test_dct_dc_coefficient(self):
        """DC coefficient of a constant block is 8*value (orthonormal DCT)."""
        x = jnp.ones((1, 8, 8, 1), jnp.float32) * 2.0
        f = block_dct.block_dct_8x8(x)
        np.testing.assert_allclose(f[0, 0, 0, 0, 0, 0], 16.0, rtol=1e-5)
        np.testing.assert_allclose(jnp.sum(jnp.abs(f)) - jnp.abs(f[0, 0, 0, 0, 0, 0]), 0.0, atol=1e-4)

    def test_freq_weight_shape_and_mean(self):
        w = block_dct.build_freq_weight(quality=85, mode="inv_gamma", gamma=1.0)
        assert w.shape == (3, 8, 8)
        # each channel's weights are mean-normalized
        np.testing.assert_allclose(w.mean(axis=(1, 2)), np.ones(3), rtol=1e-5)
        # low frequencies weighted higher than high frequencies
        assert w[0, 0, 0] > w[0, 7, 7]

    def test_ycbcr(self):
        x = jnp.asarray([[[[1.0, 1.0, 1.0]]]])  # white pixel
        y = block_dct.rgb_to_ycbcr(x)
        np.testing.assert_allclose(y[0, 0, 0], [1.0, 0.0, 0.0], atol=1e-6)

    def test_freq_mse_linearity_equivalence(self):
        """Loss of (pred-target) equals the reference's DCT(pred)-DCT(target) form."""
        rng = np.random.RandomState(2)
        pred = jnp.asarray(rng.randn(2, 16, 16, 3), jnp.float32)
        target = jnp.asarray(rng.randn(2, 16, 16, 3), jnp.float32)
        w = block_dct.build_freq_weight()
        loss1 = block_dct.frequency_weighted_mse_xla(pred - target, w)
        f1 = block_dct.block_dct_8x8(block_dct.rgb_to_ycbcr(pred))
        f2 = block_dct.block_dct_8x8(block_dct.rgb_to_ycbcr(target))
        loss2 = jnp.mean(jnp.asarray(w)[None, None, None] * (f1 - f2) ** 2)
        np.testing.assert_allclose(loss1, loss2, rtol=1e-4)

    def test_freq_mse_grad_matches_autodiff(self):
        rng = np.random.RandomState(3)
        diff = jnp.asarray(rng.randn(1, 16, 16, 3), jnp.float32)
        w = block_dct.build_freq_weight()
        g_custom = jax.grad(lambda d: block_dct.frequency_weighted_mse(d, w))(diff)
        g_auto = jax.grad(lambda d: block_dct.frequency_weighted_mse_xla(d, w))(diff)
        np.testing.assert_allclose(g_custom, g_auto, atol=1e-5)
