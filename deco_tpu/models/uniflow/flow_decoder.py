"""Per-token rectified-flow decoder head (UniFlow).

Parity with reference ``FlowDecoder`` (``src/models/uniflow/
modeling_uniflow.py:700-929`` of hhhhzp/DeCo): NerfEmbedder on the condition
tokens, logit-normal (90/10 mixed) timestep draw, ``x_t = t*x1 + (1-t)*x0``,
velocity MSE (+ optional LPIPS on the reassembled image), and Euler sampling
with ``linear``/``pow_p`` schedules, optional CFG against a learnable mask
token with the EDM-convention interval.

TPU design: training is fully vectorized over (B, N) tokens; sampling is a
``lax.scan`` with static per-step (t, dt, cfg-on) tables. The reference's
``self.mask_token`` is referenced but commented out of ``__init__`` (snapshot
breakage); here it is a real parameter, used only when cfg != 1.

Documented reconstruction detail: the (unexecutable) reference CFG branch
passes the raw mask token to the net while the conditional branch passes the
nerf-EMBEDDED condition (modeling_uniflow.py:893-909 — possible only because
NerfEmbedder maps z_channels -> z_channels); here the null token goes through
the same nerf embedding as the condition, so the unconditional branch also
carries the positional basis. There is no working upstream semantics to
match (mask_token is absent and the noise draw hard-codes .cuda()).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from deco_tpu.models.uniflow.components import (
    TimeCondMLPAdaLN,
    UniFlowNerfEmbedder,
    l2p_transform,
)


def _edm_to_flow_convention(noise_level: float) -> float:
    return noise_level / (1 + noise_level)


def flow_decoder_timesteps(num_steps: int, schedule: str = "linear"):
    """(ts, dts) tables; time runs 0 -> 1 (reference :869-884)."""
    if schedule == "linear":
        ts = np.arange(1, num_steps + 1)[::-1] / num_steps
        dts = np.full(num_steps, 1.0 / num_steps)
    elif schedule.startswith("pow"):
        p = float(schedule.split("_")[1])
        ts = np.arange(0, num_steps + 1)[::-1] ** (1 / p) / num_steps ** (1 / p)
        dts = ts[:-1] - ts[1:]
        ts = ts[:-1]
    else:
        raise NotImplementedError(schedule)
    return (1 - ts).astype(np.float32), dts.astype(np.float32)


class FlowDecoder(nn.Module):
    target_channels: int
    z_channels: int
    width: int
    depth: int
    num_sampling_steps: int = 100
    patch_size: int = 14
    max_freqs: int = 32
    lognorm_mix_p: float = 0.9
    use_cfg: bool = False
    dtype: Any = jnp.bfloat16

    def setup(self):
        self.nerf_embedder = UniFlowNerfEmbedder(
            self.z_channels, max_freqs=self.max_freqs, dtype=self.dtype,
            name="nerf_embedder",
        )
        self.net = TimeCondMLPAdaLN(
            model_channels=self.width,
            out_channels=self.target_channels,
            num_res_blocks=self.depth,
            dtype=self.dtype,
            name="net",
        )
        self.mask_token = self.param(
            "mask_token", nn.initializers.zeros, (1, 1, self.z_channels),
            jnp.float32,
        )

    def forward_train(self, x1, z, rng):
        """x1: (B, N, C_target) clean targets; z: (B, N, C_z) conditions.

        Returns dict(mse_loss, pred) — LPIPS is applied by the caller on the
        reassembled image (keeps the frozen tower out of this module).
        """
        b, n, c = x1.shape
        z = self.nerf_embedder(z)
        rng_nt, rng_mix, rng_u, rng_x0 = jax.random.split(rng, 4)
        t_log = jax.nn.sigmoid(jax.random.normal(rng_nt, (b, n)))
        t_uni = jax.random.uniform(rng_u, (b, n))
        t = jnp.where(
            jax.random.uniform(rng_mix, (b, n)) <= self.lognorm_mix_p, t_log, t_uni
        )
        x0 = jax.random.normal(rng_x0, x1.shape, x1.dtype)
        te = t[..., None]
        x_t = te * x1 + (1 - te) * x0
        v_target = x1 - x0
        v_pred = self.net(x_t.astype(self.dtype), t * 1000.0, z)
        mse = jnp.mean(
            (v_pred.astype(jnp.float32) - v_target.astype(jnp.float32)) ** 2
        )
        x1_pred = x_t + (1 - te) * v_pred.astype(x_t.dtype)
        return dict(mse_loss=mse, pred=x1_pred)

    def sample(self, z, rng, schedule: str = "linear", cfg: float = 1.0,
               cfg_interval: Optional[tuple] = None, as_image: bool = True):
        """Euler sampling; returns the decoded image (B, H, W, 3) or tokens."""
        b, n, _ = z.shape
        z_emb = self.nerf_embedder(z)
        ts, dts = flow_decoder_timesteps(self.num_sampling_steps, schedule)
        use_cfg = cfg != 1.0
        if use_cfg:
            null = jnp.broadcast_to(
                self.mask_token.astype(z.dtype), z.shape
            )
            null_emb = self.nerf_embedder(null)
            if cfg_interval is not None:
                lo = _edm_to_flow_convention(cfg_interval[0])
                hi = _edm_to_flow_convention(cfg_interval[1])
                on = (ts >= lo) & (ts <= hi)
            else:
                on = np.ones_like(ts, bool)
            cfg_per_step = np.where(on, cfg, 1.0).astype(np.float32)
        x = jax.random.normal(rng, (b, n, self.target_channels))

        if self.is_initializing():
            # materialize net params OUTSIDE the scan trace: params created
            # inside lax.scan during flax init would leak tracers into the tree
            return self.net(x.astype(self.dtype), jnp.zeros((b, n)), z_emb)

        steps = dict(t=jnp.asarray(ts), dt=jnp.asarray(dts))
        if use_cfg:
            steps["cfg"] = jnp.asarray(cfg_per_step)

        def body(x, step):
            tt = jnp.broadcast_to(step["t"] * 1000.0, (b, n))
            vc = self.net(x.astype(self.dtype), tt, z_emb).astype(x.dtype)
            if use_cfg:
                vu = self.net(x.astype(self.dtype), tt, null_emb).astype(x.dtype)
                vc = vu + step["cfg"] * (vc - vu)
            return x + step["dt"] * vc, None

        x, _ = jax.lax.scan(body, x, steps)
        if as_image:
            return l2p_transform(x, self.patch_size)
        return x

    def __call__(self, x1, z, rng):
        # default call = training loss (makes nn.Module init straightforward)
        return self.forward_train(x1, z, rng)
