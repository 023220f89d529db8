"""Flow-matching / diffusion interpolant schedulers.

Pure, stateless math on timestep arrays. Schedulers define the interpolant
``x_t = alpha(t) * x + sigma(t) * eps`` and its derivatives; all derived
quantities (drift/diffusion coefficients, the SDE weight ``w``) follow.

Behavioral parity with the reference implementation
(``src/diffusion/base/scheduling.py:4-32`` and
``src/diffusion/flow_matching/scheduling.py:6-39`` of hhhhzp/DeCo), re-designed
as pure functions over ``jnp`` arrays: callers broadcast scalars themselves via
:func:`bcast_right`, instead of the reference's hard-coded NCHW ``view(-1,1,1,1)``.
Everything here is traceable under ``jit`` and cheap enough to precompute with
numpy for static sampler timesteps.
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp


def bcast_right(t, ndim: int):
    """Append trailing singleton dims so ``t`` broadcasts against an ndim array."""
    return jnp.reshape(t, t.shape + (1,) * (ndim - t.ndim))


@dataclasses.dataclass(frozen=True)
class BaseScheduler:
    """Interpolant abstraction: alpha/sigma and derivatives as functions of t."""

    def alpha(self, t):
        raise NotImplementedError

    def sigma(self, t):
        raise NotImplementedError

    def dalpha(self, t):
        raise NotImplementedError

    def dsigma(self, t):
        raise NotImplementedError

    def dalpha_over_alpha(self, t):
        return self.dalpha(t) / self.alpha(t)

    def dsigma_mul_sigma(self, t):
        return self.dsigma(t) * self.sigma(t)

    def drift_coefficient(self, t):
        # Reference: dalpha / (alpha + 1e-6)  (scheduling.py:21-24)
        return self.dalpha(t) / (self.alpha(t) + 1e-6)

    def diffuse_coefficient(self, t):
        # Reference: dsigma*sigma - dalpha/(alpha+1e-6)*sigma**2  (scheduling.py:26-29)
        return self.dsigma(t) * self.sigma(t) - self.dalpha(t) / (
            self.alpha(t) + 1e-6
        ) * self.sigma(t) ** 2

    def w(self, t):
        return self.sigma(t)

    def isotropic_coeffs(self, t):
        """(alpha, dalpha, sigma, dsigma) evaluated together."""
        return self.alpha(t), self.dalpha(t), self.sigma(t), self.dsigma(t)


@dataclasses.dataclass(frozen=True)
class LinearScheduler(BaseScheduler):
    """Rectified-flow linear interpolant: alpha=t, sigma=1-t."""

    def alpha(self, t):
        return t

    def sigma(self, t):
        return 1.0 - t

    def dalpha(self, t):
        return jnp.ones_like(t)

    def dsigma(self, t):
        return -jnp.ones_like(t)


@dataclasses.dataclass(frozen=True)
class GVPScheduler(BaseScheduler):
    """Generalized VP (cosine) interpolant. Reference scheduling.py:17-27."""

    def alpha(self, t):
        return jnp.cos(t * (math.pi / 2))

    def sigma(self, t):
        return jnp.sin(t * (math.pi / 2))

    def dalpha(self, t):
        return -jnp.sin(t * (math.pi / 2))

    def dsigma(self, t):
        return jnp.cos(t * (math.pi / 2))

    def w(self, t):
        # NOTE: the reference uses sin(t)**2 (not sin(pi t/2)**2); mirrored.
        return jnp.sin(t) ** 2


@dataclasses.dataclass(frozen=True)
class ConstScheduler(BaseScheduler):
    """Constant-w scheduler used only as a w_scheduler. Reference scheduling.py:29-31."""

    def w(self, t):
        return jnp.ones_like(t)


@dataclasses.dataclass(frozen=True)
class VPScheduler(BaseScheduler):
    """Continuous-time VP scheduler.

    Parity with reference ``src/diffusion/ddpm/scheduling.py:57-102``:
    t is diffusion time directly, clamped to [1e-3, 1];
    ``beta(t) = beta_min + beta_d * t``, ``alpha = exp(-0.5 * I(t))``,
    ``sigma = sqrt(1 - exp(-I(t)))`` where ``I(t) = 0.5*beta_d*t^2 + beta_min*t``.
    Derivative methods raise in the reference ("wrong usage"); we leave them
    unimplemented via the base class raising NotImplementedError.
    """

    beta_min: float = 0.1
    beta_max: float = 20.0

    @property
    def beta_d(self):
        return self.beta_max - self.beta_min

    def beta(self, t):
        t = jnp.clip(t, 1e-3, 1.0)
        return self.beta_min + self.beta_d * t

    def _integral_beta(self, t):
        t = jnp.clip(t, 1e-3, 1.0)
        return 0.5 * self.beta_d * t**2 + self.beta_min * t

    def alpha(self, t):
        return jnp.exp(-0.5 * self._integral_beta(t))

    def sigma(self, t):
        return jnp.sqrt(1.0 - jnp.exp(-self._integral_beta(t)))


@dataclasses.dataclass(frozen=True)
class DDPMScheduler(BaseScheduler):
    """Discrete DDPM table scheduler (reference ddpm/scheduling.py:6-54).

    ``t`` indexes the table (integer timesteps in [0, num_steps)).
    """

    beta_min: float = 0.0001
    beta_max: float = 0.02
    num_steps: int = 1000

    def _tables(self):
        betas = jnp.linspace(self.beta_min, self.beta_max, self.num_steps)
        alphas = jnp.cumprod(1.0 - betas)
        sigmas = 1.0 - alphas
        return betas, alphas, sigmas

    def beta(self, t):
        betas, _, _ = self._tables()
        return betas[t.astype(jnp.int32)]

    def alpha(self, t):
        _, alphas, _ = self._tables()
        return alphas[t.astype(jnp.int32)] ** 0.5

    def sigma(self, t):
        _, _, sigmas = self._tables()
        return sigmas[t.astype(jnp.int32)] ** 0.5


@dataclasses.dataclass(frozen=True)
class VPBetaScheduler(VPScheduler):
    """VP scheduler whose w(t) is beta(t) (reference scheduling.py:34-37)."""

    def w(self, t):
        return self.beta(t)
