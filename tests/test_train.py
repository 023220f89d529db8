"""Train step + parallelism tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from deco_tpu.diffusion.scheduling import DDPMScheduler, LinearScheduler, VPScheduler
from deco_tpu.diffusion.ddpm_sampling import DDIMSampler, VPEulerSampler
from deco_tpu.diffusion.training import DeCoTrainer, FlowMatchingTrainer
from deco_tpu.models.dit_c2i_deco import DeCoC2I
from deco_tpu.parallel import mesh as mesh_lib
from deco_tpu.train.state import TrainState, ema_update
from deco_tpu.train.train_step import make_train_step


def tiny_model():
    return DeCoC2I(
        in_channels=3, patch_size=4, num_groups=2, hidden_size=32,
        hidden_size_x=8, num_blocks=4, num_cond_blocks=2, num_classes=10,
    )


def make_state_and_step(**step_kw):
    model = tiny_model()
    x = jnp.zeros((4, 16, 16, 3))
    params = model.init(
        jax.random.PRNGKey(0), x, jnp.zeros((4,)), jnp.zeros((4,), jnp.int32)
    )
    tx = optax.adamw(1e-3)
    state = TrainState.create(params, tx)
    trainer = DeCoTrainer(scheduler=LinearScheduler(), lognorm_t=True,
                          null_condition_p=0.2)
    apply_fn = lambda p, xt, t, y: model.apply(p, xt, t, y)
    step = make_train_step(apply_fn, trainer, **step_kw)
    batch = dict(
        x=jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 3)),
        condition=jnp.asarray([0, 1, 2, 3]),
        uncondition=jnp.full((4,), 10),
    )
    return state, step, batch


class TestTrainStep:
    def test_loss_decreases_on_fixed_batch(self):
        state, step, batch = make_state_and_step(donate=False)
        rng = jax.random.PRNGKey(2)
        losses = []
        for i in range(30):
            state, metrics = step(state, batch, jax.random.fold_in(rng, i % 3))
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0]
        assert int(state.step) == 30

    def test_ema_tracks_params(self):
        state, step, batch = make_state_and_step(ema_decay=0.5, donate=False)
        s1, _ = step(state, batch, jax.random.PRNGKey(0))
        # ema = 0.5*old + 0.5*new
        leaf = jax.tree.leaves(s1.params)[0]
        old = jax.tree.leaves(state.params)[0]
        ema = jax.tree.leaves(s1.ema_params)[0]
        np.testing.assert_allclose(ema, 0.5 * old + 0.5 * leaf, atol=1e-6)

    def test_ema_fp32(self):
        state, _, _ = make_state_and_step()
        for leaf in jax.tree.leaves(state.ema_params):
            assert leaf.dtype == jnp.float32

    def test_grad_clip_records_norm(self):
        state, step, batch = make_state_and_step(grad_clip=1e-9, donate=False)
        s1, metrics = step(state, batch, jax.random.PRNGKey(0))
        assert "grad_norm" in metrics
        # with clip tiny, params barely move
        d = jax.tree.map(lambda a, b: np.abs(a - b).max(), s1.params, state.params)
        assert max(jax.tree.leaves(d)) < 1e-4

    def test_diffusion_batch_mul(self):
        """batch_mul replicates latents: loss computed over 2x batch."""
        state, step, batch = make_state_and_step(diffusion_batch_mul=2, donate=False)
        _, metrics = step(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))


class TestMesh:
    def test_make_mesh_shapes(self):
        mesh = mesh_lib.make_mesh()
        assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1
        mesh2 = mesh_lib.make_mesh(model=2)
        assert mesh2.shape["data"] == 4 and mesh2.shape["model"] == 2

    def test_sharded_train_step_matches_single_device(self):
        """DP-sharded train step produces the same loss as unsharded."""
        state, step, batch = make_state_and_step(donate=False)
        rng = jax.random.PRNGKey(3)
        _, m_single = step(state, batch, rng)

        mesh = mesh_lib.make_mesh(model=2)
        state2, step2, _ = make_state_and_step(donate=False)
        state2 = state2.replace(
            params=mesh_lib.shard_params(mesh, state2.params, min_size=2**10),
            ema_params=mesh_lib.shard_params(mesh, state2.ema_params, min_size=2**10),
        )
        sbatch = mesh_lib.shard_batch(mesh, batch)
        with jax.set_mesh(mesh):
            _, m_sharded = step2(state2, sbatch, rng)
        np.testing.assert_allclose(
            float(m_single["loss"]), float(m_sharded["loss"]), rtol=1e-4
        )

    def test_param_partition_spec(self):
        big = jnp.zeros((2048, 1024))
        small = jnp.zeros((16,))
        spec_big = mesh_lib.param_partition_spec(big, model_axis_size=2, min_size=2**10)
        spec_small = mesh_lib.param_partition_spec(small, model_axis_size=2, min_size=2**10)
        assert spec_big == jax.sharding.PartitionSpec("model", None)
        assert spec_small == jax.sharding.PartitionSpec()


class TestDDPMSamplers:
    def test_ddim_shapes(self):
        sampler = DDIMSampler(
            scheduler=DDPMScheduler(num_steps=100), train_num_steps=100,
            num_steps=5, guidance=1.0,
        )
        net = lambda x, t, y: jnp.zeros_like(x)
        out = sampler(net, jnp.ones((2, 8, 8, 3)), jnp.zeros((2,)), jnp.zeros((2,)))
        assert out.shape == (2, 8, 8, 3)
        assert np.isfinite(np.asarray(out)).all()

    def test_ddim_perfect_eps_recovers_x0(self):
        """If net returns the exact eps, DDIM recovers x0 in one step."""
        sched = DDPMScheduler(num_steps=100)
        x0_true = jnp.asarray(np.random.RandomState(0).randn(2, 8, 8, 3), jnp.float32)
        eps_true = jnp.asarray(np.random.RandomState(1).randn(2, 8, 8, 3), jnp.float32)
        t99 = jnp.full((2,), 99)
        from deco_tpu.diffusion.scheduling import bcast_right
        x_t = (bcast_right(sched.alpha(t99), 4) * x0_true
               + bcast_right(sched.sigma(t99), 4) * eps_true)
        net = lambda x, t, y: jnp.concatenate([eps_true, eps_true], axis=0)
        sampler = DDIMSampler(
            scheduler=sched, train_num_steps=100, num_steps=100, guidance=1.0
        )
        # run: x starts at x_t99... full chain with exact eps stays consistent:
        out = sampler(net, x_t, jnp.zeros((2,)), jnp.zeros((2,)))
        # final x = alpha(0)*x0 + sigma(0)*eps; alpha(0)~1, sigma(0)~0.01
        expected = (bcast_right(sched.alpha(jnp.zeros(2)), 4) * x0_true
                    + bcast_right(sched.sigma(jnp.zeros(2)), 4) * eps_true)
        np.testing.assert_allclose(out, expected, atol=1e-4)

    def test_vp_euler_finite(self):
        sampler = VPEulerSampler(
            scheduler=VPScheduler(), num_steps=8, guidance=1.0,
        )
        net = lambda x, t, y: jnp.zeros_like(x)
        out = sampler(net, jnp.ones((2, 8, 8, 3)), jnp.zeros((2,)), jnp.zeros((2,)))
        assert np.isfinite(np.asarray(out)).all()

    def test_vp_euler_sde_finite(self):
        sampler = VPEulerSampler(
            scheduler=VPScheduler(), num_steps=8, guidance=1.0, step_fn="sde",
        )
        net = lambda x, t, y: jnp.zeros_like(x)
        out = sampler(
            net, jnp.ones((2, 8, 8, 3)), jnp.zeros((2,)), jnp.zeros((2,)),
            rng=jax.random.PRNGKey(0),
        )
        assert np.isfinite(np.asarray(out)).all()


class TestGradAccumulation:
    """accumulate_grad_batches=k must equal one full-batch step exactly
    when the objective is deterministic (mean-of-microbatch-means == full mean
    for equal microbatch sizes)."""

    def _setup(self):
        import jax
        import jax.numpy as jnp
        import optax
        from flax import linen as nn

        from deco_tpu.train.state import TrainState
        from deco_tpu.train.train_step import make_train_step

        class TinyNet(nn.Module):
            @nn.compact
            def __call__(self, x_t, t, y, **kw):
                return nn.Dense(3)(x_t)

        class DetTrainer:
            def __call__(self, rng, net, x, cond, uncond, metadata=None,
                         params=None):
                pred = net(x, jnp.zeros(x.shape[0]), cond)
                loss = jnp.mean((pred - 1.0) ** 2)
                return {"loss": loss}

        net = TinyNet()
        x = jnp.zeros((4, 8, 8, 3))
        params = net.init(jax.random.PRNGKey(0), x, None, None)
        apply_fn = lambda p, *a, **kw: net.apply(p, *a, **kw)
        tx = optax.adamw(1e-2)
        batch = {
            "x": jnp.asarray(np.random.RandomState(0).randn(4, 8, 8, 3),
                             jnp.float32),
            "condition": jnp.zeros((4,), jnp.int32),
            "uncondition": jnp.zeros((4,), jnp.int32),
        }
        return (make_train_step, TrainState, apply_fn, DetTrainer(), tx,
                params, batch)

    def test_k2_matches_full_batch(self):
        import jax
        import jax.numpy as jnp

        (make_train_step, TrainState, apply_fn, trainer, tx, params,
         batch) = self._setup()
        rng = jax.random.PRNGKey(7)
        s1 = TrainState.create(params, tx)
        step1 = make_train_step(apply_fn, trainer, donate=False)
        s1, m1 = step1(s1, batch, rng)
        s2 = TrainState.create(params, tx)
        step2 = make_train_step(apply_fn, trainer, donate=False,
                                accumulate_grad_batches=2)
        s2, m2 = step2(s2, batch, rng)
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                                   rtol=1e-6)
        for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_k2_with_grad_clip_runs(self):
        import jax

        (make_train_step, TrainState, apply_fn, trainer, tx, params,
         batch) = self._setup()
        state = TrainState.create(params, tx)
        step = make_train_step(apply_fn, trainer, donate=False,
                               accumulate_grad_batches=2, grad_clip=0.1)
        state, metrics = step(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))
        assert "grad_norm" in metrics


def test_ema_decay_schedule_matches_reference():
    """Pin ema_decay_schedule against the reference EMAModel.get_decay
    (src/models/modules/ema_model.py:92-106) over both warmup forms, the
    clamps, and the update_after_step offset."""
    import importlib.util
    import os
    import sys

    ref = "/root/reference/src/models/modules/ema_model.py"
    if not os.path.isfile(ref):
        import pytest
        pytest.skip("reference tree not available")
    torch = __import__("torch")
    spec = importlib.util.spec_from_file_location("ref_ema_model", ref)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_ema_model"] = mod
    spec.loader.exec_module(mod)

    from deco_tpu.train.state import ema_decay_schedule

    for kwargs in (
        dict(),
        dict(use_ema_warmup=True, inv_gamma=1.0, power=2.0 / 3.0),
        dict(use_ema_warmup=True, inv_gamma=3.0, power=0.75,
             min_decay=0.2, decay=0.995),
        dict(update_after_step=5),
        # pathological min_decay > decay: the reference applies max() last
        # so min_decay wins
        dict(min_decay=0.95, decay=0.9),
    ):
        ema = mod.EMAModel([torch.zeros(1)], **kwargs)
        for step in [0, 1, 2, 3, 7, 10, 100, 31600, 1000000]:
            want = ema.get_decay(step)
            got = float(ema_decay_schedule(step, **kwargs))
            assert abs(got - want) < 1e-6, (kwargs, step, got, want)

    # update_every: off-grid steps yield factor 1.0 (EMA unchanged), on-grid
    # steps match the reference get_decay — mirrors EMAModel.step():117-121
    for step in range(1, 12):
        got = float(ema_decay_schedule(step, update_every=3))
        ema = mod.EMAModel([torch.zeros(1)])
        want = ema.get_decay(step) if (step - 1) % 3 == 0 else 1.0
        assert abs(got - want) < 1e-6, (step, got, want)
