"""DeCo trainer-loss parity vs the reference REPATrainer, with injected
randomness — including the paper's headline DCT frequency loss evaluated
against the reference's own live machinery.

Both `_impl_trainstep` bodies draw (nt, t_uniform, mix, noise) in the same
order and shapes; the test monkeypatches torch.randn/rand/randn_like and
jax.random.normal/uniform to pop the SAME recorded arrays, so the mixed
lognormal/uniform timestep draw, timeshift, interpolant construction, and
velocity-MSE reduction are compared end-to-end on the converted tiny c2i
model (training_repa_DeCo.py:216-287).

The frequency term is commented out of the reference `_impl_trainstep`
(:276-278) but its machinery is live (:95-195); the test evaluates
``(freq_w * (DCT(YCbCr(out)) - DCT(YCbCr(v_t)))**2).mean()`` through the
reference's `_rgb2ycbcr`/`_dct`/`freq_w` buffers and compares against
deco_tpu's fused `block_dct.frequency_weighted_mse` (which transforms the
difference once — DCT/YCbCr are linear). This is the golden pin for
ops/block_dct (previously covered by orthonormality/round-trip tests only).
"""

import os
import sys
from unittest import mock

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not available"
)

KW = dict(in_channels=3, patch_size=4, num_groups=2, hidden_size=32,
          hidden_size_x=8, num_blocks=4, num_cond_blocks=2, num_classes=10)


@pytest.fixture(scope="module")
def ref_trainer_mod():
    torch = pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from ref_stub_util import install_stubs, remove_stubs

    added = install_stubs(torch)
    # the reference decorates _dct with @torch.compile(); run it eagerly
    # (inductor-on-CPU is irrelevant to the math being pinned); restored
    # on teardown
    prev_dynamo_disable = torch._dynamo.config.disable
    torch._dynamo.config.disable = True
    import importlib.util

    from src.diffusion.flow_matching.scheduling import LinearScheduler

    spec = importlib.util.spec_from_file_location(
        "ref_trainer_deco",
        os.path.join(REF, "src/diffusion/flow_matching/training_repa_DeCo.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_trainer_deco"] = mod
    spec.loader.exec_module(mod)
    spec2 = importlib.util.spec_from_file_location(
        "ref_dit_trainer", os.path.join(
            REF, "src/models/transformer/dit_c2i_DeCo.py")
    )
    dit = importlib.util.module_from_spec(spec2)
    sys.modules["ref_dit_trainer"] = dit
    spec2.loader.exec_module(dit)
    yield mod, LinearScheduler, dit
    torch._dynamo.config.disable = prev_dynamo_disable
    remove_stubs(added)


def test_deco_trainer_loss_and_freq_parity(ref_trainer_mod):
    import torch

    import jax
    import jax.numpy as jnp

    from deco_tpu.convert.torch_to_flax import convert_deco_c2i
    from deco_tpu.diffusion.scheduling import LinearScheduler
    from deco_tpu.diffusion.training import DeCoTrainer
    from deco_tpu.models.dit_c2i_deco import DeCoC2I

    mod, TLinear, dit = ref_trainer_mod
    tmodel = dit.PixNerDiT(**KW).eval()
    g = torch.Generator().manual_seed(11)
    with torch.no_grad():
        for p in tmodel.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)

    rs = np.random.RandomState(11)
    batch = 2
    x = (rs.uniform(-1, 1, (batch, 3, 16, 16))).astype(np.float32)
    y = np.asarray([1, 7])
    q_nt = rs.randn(batch).astype(np.float32)
    q_uni = [rs.uniform(0, 1, batch).astype(np.float32),
             rs.uniform(0, 1, batch).astype(np.float32)]
    q_noise = rs.randn(batch, 3, 16, 16).astype(np.float32)

    # ---- reference side: monkeypatch the torch draws ----
    t_uni_iter = iter([torch.from_numpy(v) for v in q_uni])
    with mock.patch.object(
        torch, "randn",
        side_effect=lambda *s, **k: torch.from_numpy(q_nt)), \
            mock.patch.object(
        torch, "rand", side_effect=lambda *s, **k: next(t_uni_iter)), \
            mock.patch.object(
        torch, "randn_like",
        side_effect=lambda t, **k: torch.from_numpy(q_noise)):
        ttrainer = mod.REPATrainer(
            scheduler=TLinear(), lognorm_t=True, timeshift=1.0,
            # upstream asserts encoder is not None (no_grad) even though the
            # REPA branch is commented out of _impl_trainstep
            encoder=torch.nn.Identity(),
        )
        with torch.no_grad():
            out_t = ttrainer._impl_trainstep(
                tmodel, None, None, torch.from_numpy(x),
                torch.from_numpy(y), metadata={"raw_image": None},
            )
    fm_t = float(out_t["fm_loss"])

    # reference freq term through its own live machinery (:95-195), on the
    # same out/v_t reconstructed from the recorded draws
    with torch.no_grad():
        t_log = torch.sigmoid(torch.from_numpy(q_nt))
        t_mix = torch.where(torch.from_numpy(q_uni[1]) <= 0.9, t_log,
                            torch.from_numpy(q_uni[0]))
        t = mod.time_shift_fn(t_mix, 1.0)
        sched = TLinear()
        alpha, dalpha = sched.alpha(t), sched.dalpha(t)
        sigma, dsigma = sched.sigma(t), sched.dsigma(t)
        noise_t = torch.from_numpy(q_noise)
        x_t = alpha * torch.from_numpy(x) + sigma * noise_t
        v_t = dalpha * torch.from_numpy(x) + dsigma * noise_t
        net_out = tmodel(x_t, t, torch.from_numpy(y))
        fm_check = float(((net_out - v_t) ** 2).mean())
        freq_t = float((
            ttrainer.freq_w
            * (ttrainer._dct(ttrainer._rgb2ycbcr(net_out))
               - ttrainer._dct(ttrainer._rgb2ycbcr(v_t))) ** 2
        ).mean())
    # the reconstruction must agree with the monkeypatched run
    np.testing.assert_allclose(fm_check, fm_t, rtol=1e-5)

    # ---- deco_tpu side: monkeypatch the jax draws ----
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params = convert_deco_c2i(sd, in_channels=3, patch_size=4)
    jmodel = DeCoC2I(**KW, dtype=jnp.float32)
    net = lambda xt, t, yy: jmodel.apply({"params": params}, xt, t, yy)
    jtrainer = DeCoTrainer(
        scheduler=LinearScheduler(), lognorm_t=True, timeshift=1.0,
        enable_freq_loss=True,
    )
    j_uni_iter = iter([jnp.asarray(v) for v in q_uni])
    noise_nhwc = jnp.asarray(q_noise.transpose(0, 2, 3, 1))

    def j_normal(rng, shape=None, dtype=jnp.float32):
        return jnp.asarray(q_nt) if shape == (batch,) else noise_nhwc

    with mock.patch.object(jax.random, "normal", side_effect=j_normal), \
            mock.patch.object(
        jax.random, "uniform",
        side_effect=lambda rng, shape=None, **k: next(j_uni_iter)):
        losses = jtrainer._impl_trainstep(
            jax.random.PRNGKey(0), net,
            jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(y),
        )
    np.testing.assert_allclose(float(losses["fm_loss"]), fm_t,
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(losses["fm_loss_freq"]), freq_t,
                               rtol=1e-4, atol=1e-6)


def test_vp_trainer_loss_parity(ref_trainer_mod):
    """eps-prediction VP trainer pin (ddpm/training.py:17-49) with injected
    t/noise draws; continuous VP scheduler, x1000 net timesteps."""
    import torch

    import jax
    import jax.numpy as jnp

    if REF not in sys.path:
        sys.path.insert(0, REF)
    from src.diffusion.ddpm.scheduling import VPScheduler as TVPSched
    from src.diffusion.ddpm.training import VPTrainer as TVP

    from deco_tpu.convert.torch_to_flax import convert_deco_c2i
    from deco_tpu.diffusion.scheduling import VPScheduler
    from deco_tpu.diffusion.training import VPTrainer
    from deco_tpu.models.dit_c2i_deco import DeCoC2I

    _, _, dit = ref_trainer_mod
    tmodel = dit.PixNerDiT(**KW).eval()
    g = torch.Generator().manual_seed(14)
    with torch.no_grad():
        for p in tmodel.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)

    rs = np.random.RandomState(14)
    batch = 2
    x = rs.uniform(-1, 1, (batch, 3, 16, 16)).astype(np.float32)
    y = np.asarray([3, 6])
    q_t = rs.uniform(0, 1, batch).astype(np.float32)
    q_noise = rs.randn(batch, 3, 16, 16).astype(np.float32)

    with mock.patch.object(
        torch, "rand", side_effect=lambda *s, **k: torch.from_numpy(q_t)), \
            mock.patch.object(
        torch, "randn_like",
        side_effect=lambda t, **k: torch.from_numpy(q_noise)):
        ttrainer = TVP(scheduler=TVPSched(), lognorm_t=False)
        with torch.no_grad():
            out_t = ttrainer._impl_trainstep(
                tmodel, None, None, torch.from_numpy(x), torch.from_numpy(y))
    loss_t = float(out_t["loss"])

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params = convert_deco_c2i(sd, in_channels=3, patch_size=4)
    jmodel = DeCoC2I(**KW, dtype=jnp.float32)
    net = lambda xt, t, yy: jmodel.apply({"params": params}, xt, t, yy)
    jtrainer = VPTrainer(scheduler=VPScheduler(), lognorm_t=False)
    noise_nhwc = jnp.asarray(q_noise.transpose(0, 2, 3, 1))
    with mock.patch.object(
        jax.random, "normal",
        side_effect=lambda rng, shape=None, dtype=jnp.float32: noise_nhwc), \
            mock.patch.object(
        jax.random, "uniform",
        side_effect=lambda rng, shape=None, **k: jnp.asarray(q_t)):
        losses = jtrainer._impl_trainstep(
            jax.random.PRNGKey(0), net,
            jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(y))
    np.testing.assert_allclose(float(losses["loss"]), loss_t,
                               rtol=1e-4, atol=1e-6)


def test_ddpm_trainer_loss_parity(ref_trainer_mod):
    """Discrete-t eps-prediction trainer pin (ddpm/training.py:52-95) with
    injected integer timesteps and noise; CPU-rebuilt DDPM tables."""
    import torch

    import jax
    import jax.numpy as jnp

    if REF not in sys.path:
        sys.path.insert(0, REF)
    from src.diffusion.ddpm.scheduling import DDPMScheduler as TSched
    from src.diffusion.ddpm.training import DDPMTrainer as TDDPM

    from deco_tpu.convert.torch_to_flax import convert_deco_c2i
    from deco_tpu.diffusion.scheduling import DDPMScheduler
    from deco_tpu.diffusion.training import DDPMTrainer
    from deco_tpu.models.dit_c2i_deco import DeCoC2I

    _, _, dit = ref_trainer_mod
    tmodel = dit.PixNerDiT(**KW).eval()
    g = torch.Generator().manual_seed(15)
    with torch.no_grad():
        for p in tmodel.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)

    rs = np.random.RandomState(15)
    batch = 2
    x = rs.uniform(-1, 1, (batch, 3, 16, 16)).astype(np.float32)
    y = np.asarray([0, 9])
    q_t = rs.randint(0, 1000, batch).astype(np.int64)
    q_noise = rs.randn(batch, 3, 16, 16).astype(np.float32)

    orig_linspace = torch.linspace

    def cpu_linspace(*a, **k):
        k.pop("device", None)  # upstream hard-codes device="cuda"
        return orig_linspace(*a, **k)

    with mock.patch.object(torch, "linspace", cpu_linspace):
        tsched = TSched()
    with mock.patch.object(
        torch, "randint",
        side_effect=lambda *a, **k: torch.from_numpy(q_t)), \
            mock.patch.object(
        torch, "randn_like",
        side_effect=lambda t, **k: torch.from_numpy(q_noise)):
        ttrainer = TDDPM(scheduler=tsched)
        with torch.no_grad():
            out_t = ttrainer._impl_trainstep(
                tmodel, None, torch.from_numpy(x), torch.from_numpy(y))
    loss_t = float(out_t["loss"])

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params = convert_deco_c2i(sd, in_channels=3, patch_size=4)
    jmodel = DeCoC2I(**KW, dtype=jnp.float32)
    net = lambda xt, t, yy: jmodel.apply({"params": params}, xt, t, yy)
    jtrainer = DDPMTrainer(scheduler=DDPMScheduler())
    noise_nhwc = jnp.asarray(q_noise.transpose(0, 2, 3, 1))
    with mock.patch.object(
        jax.random, "normal",
        side_effect=lambda rng, shape=None, dtype=jnp.float32: noise_nhwc), \
            mock.patch.object(
        jax.random, "randint",
        side_effect=lambda rng, shape=None, minval=0, maxval=0:
            jnp.asarray(q_t, jnp.int32)):
        losses = jtrainer._impl_trainstep(
            jax.random.PRNGKey(0), net,
            jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(y))
    np.testing.assert_allclose(float(losses["loss"]), loss_t,
                               rtol=1e-4, atol=1e-6)


def test_fm_trainer_weighted_loss_and_dropout_parity(ref_trainer_mod):
    """FlowMatchingTrainer pin with a NON-constant weight fn (inverse_sigma
    — the first golden check of the weight-fn family, training.py:20-60) and
    the base-class CFG label dropout (preproprocess, base/training.py:14-20)
    with an injected mask draw."""
    import torch

    import jax
    import jax.numpy as jnp

    if REF not in sys.path:
        sys.path.insert(0, REF)
    from src.diffusion.flow_matching import training as t_training

    from deco_tpu.convert.torch_to_flax import convert_deco_c2i
    from deco_tpu.diffusion.scheduling import LinearScheduler
    from deco_tpu.diffusion.training import FlowMatchingTrainer
    from deco_tpu.models.dit_c2i_deco import DeCoC2I

    _, TLinear, dit = ref_trainer_mod
    tmodel = dit.PixNerDiT(**KW).eval()
    g = torch.Generator().manual_seed(16)
    with torch.no_grad():
        for p in tmodel.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)

    rs = np.random.RandomState(16)
    batch = 4
    x = rs.uniform(-1, 1, (batch, 3, 16, 16)).astype(np.float32)
    y = np.asarray([1, 4, 7, 9])
    uncond = np.full((batch,), 10)
    q_drop = rs.uniform(0, 1, batch).astype(np.float32)  # dropout mask draw
    q_t = rs.uniform(0, 1, batch).astype(np.float32)
    q_noise = rs.randn(batch, 3, 16, 16).astype(np.float32)

    t_rand_iter = iter([torch.from_numpy(q_drop), torch.from_numpy(q_t)])
    with mock.patch.object(
        torch, "rand", side_effect=lambda *s, **k: next(t_rand_iter)), \
            mock.patch.object(
        torch, "randn_like",
        side_effect=lambda t, **k: torch.from_numpy(q_noise)):
        ttrainer = t_training.FlowMatchingTrainer(
            scheduler=TLinear(), lognorm_t=False, timeshift=2.0,
            loss_weight_fn=t_training.inverse_sigma, null_condition_p=0.2,
        )
        # full __call__: dropout + train step (autocast no-ops on CPU)
        with torch.no_grad():
            out_t = ttrainer(
                tmodel, None, None, torch.from_numpy(x),
                torch.from_numpy(y), torch.from_numpy(uncond), metadata={},
            )
    loss_t = float(out_t["loss"])

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params = convert_deco_c2i(sd, in_channels=3, patch_size=4)
    jmodel = DeCoC2I(**KW, dtype=jnp.float32)
    net = lambda xt, t, yy: jmodel.apply({"params": params}, xt, t, yy)
    jtrainer = FlowMatchingTrainer(
        scheduler=LinearScheduler(), lognorm_t=False, timeshift=2.0,
        loss_weight_fn="inverse_sigma", null_condition_p=0.2,
    )
    j_uni_iter = iter([jnp.asarray(q_drop), jnp.asarray(q_t)])
    noise_nhwc = jnp.asarray(q_noise.transpose(0, 2, 3, 1))
    with mock.patch.object(
        jax.random, "normal",
        side_effect=lambda rng, shape=None, dtype=jnp.float32: noise_nhwc), \
            mock.patch.object(
        jax.random, "uniform",
        side_effect=lambda rng, shape=None, **k: next(j_uni_iter)):
        losses = jtrainer(
            jax.random.PRNGKey(0), net,
            jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(y),
            jnp.asarray(uncond),
        )
    np.testing.assert_allclose(float(losses["loss"]), loss_t,
                               rtol=1e-4, atol=1e-6)


def _copy_ref_proj(ttrainer):
    """Reference proj Sequential(Sequential(L,SiLU,L,SiLU,L)) -> our fc0/2/4
    Flax params (kernel = weight.T)."""
    import jax.numpy as jnp

    sd = {k: v.detach().numpy() for k, v in ttrainer.proj.state_dict().items()}
    return {
        f"fc{i}": {
            "kernel": jnp.asarray(sd[f"0.{2 * i}.weight"].T),
            "bias": jnp.asarray(sd[f"0.{2 * i}.bias"]),
        }
        for i in range(3)
    }


def test_repa_trainer_cos_align_parity(ref_trainer_mod):
    """training_repa.REPATrainer pin with the cosine-alignment branch ACTIVE
    (it is live upstream, :82-111, unlike the DeCo trainer where it is
    commented out): pure-lognorm t draw (no 90/10 mix), blocks[align-1] tap
    through the 3-layer proj MLP, src-token truncation to the dst count, and
    the fm + 0.5*cos composition — all with injected draws and an Identity
    encoder fed feature targets directly."""
    import importlib.util

    import torch

    import jax
    import jax.numpy as jnp

    from deco_tpu.convert.torch_to_flax import convert_deco_c2i
    from deco_tpu.diffusion.scheduling import LinearScheduler
    from deco_tpu.diffusion.training import REPATrainer
    from deco_tpu.models.dit_c2i_deco import DeCoC2I

    _, TLinear, dit = ref_trainer_mod
    spec = importlib.util.spec_from_file_location(
        "ref_trainer_repa",
        os.path.join(REF, "src/diffusion/flow_matching/training_repa.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_trainer_repa"] = mod
    spec.loader.exec_module(mod)

    tmodel = dit.PixNerDiT(**KW).eval()
    g = torch.Generator().manual_seed(21)
    with torch.no_grad():
        for p in tmodel.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)

    rs = np.random.RandomState(21)
    batch, hid = 2, KW["hidden_size"]
    x = rs.uniform(-1, 1, (batch, 3, 16, 16)).astype(np.float32)
    y = np.asarray([2, 5])
    q_nt = rs.randn(batch).astype(np.float32)
    q_noise = rs.randn(batch, 3, 16, 16).astype(np.float32)
    # dst has FEWER tokens (12) than the 16-token tap -> exercises the
    # truncation branch (training_repa.py:99-100)
    dst = rs.randn(batch, 12, 24).astype(np.float32)

    with mock.patch.object(
        torch, "randn",
        side_effect=lambda *s, **k: torch.from_numpy(q_nt)), \
            mock.patch.object(
        torch, "randn_like",
        side_effect=lambda t, **k: torch.from_numpy(q_noise)):
        ttrainer = mod.REPATrainer(
            scheduler=TLinear(), lognorm_t=True, timeshift=1.0,
            encoder=torch.nn.Identity(), align_layer=2,
            proj_denoiser_dim=hid, proj_hidden_dim=16, proj_encoder_dim=24,
        )
        with torch.no_grad():
            out_t = ttrainer._impl_trainstep(
                tmodel, None, None, torch.from_numpy(x), torch.from_numpy(y),
                metadata={"raw_image": torch.from_numpy(dst)},
            )
    fm_t, cos_t = float(out_t["fm_loss"]), float(out_t["cos_loss"])
    loss_t = float(out_t["loss"])

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params = convert_deco_c2i(sd, in_channels=3, patch_size=4)
    jmodel = DeCoC2I(**KW, dtype=jnp.float32, align_layer=2)
    net = lambda xt, t, yy, **kw: jmodel.apply(
        {"params": params}, xt, t, yy, **kw)
    jtrainer = REPATrainer(
        scheduler=LinearScheduler(), lognorm_t=True, timeshift=1.0,
        encoder=lambda raw: raw, align_layer=2,
        proj_denoiser_dim=hid, proj_hidden_dim=16, proj_encoder_dim=24,
    )
    proj_params = _copy_ref_proj(ttrainer)
    noise_nhwc = jnp.asarray(q_noise.transpose(0, 2, 3, 1))

    def j_normal(rng, shape=None, dtype=jnp.float32):
        return jnp.asarray(q_nt) if shape == (batch,) else noise_nhwc

    with mock.patch.object(jax.random, "normal", side_effect=j_normal):
        losses = jtrainer._impl_trainstep(
            jax.random.PRNGKey(0), net,
            jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(y),
            metadata={"raw_image": jnp.asarray(dst)}, params=proj_params,
        )
    np.testing.assert_allclose(float(losses["fm_loss"]), fm_t,
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(losses["cos_loss"]), cos_t,
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(losses["loss"]), loss_t,
                               rtol=1e-4, atol=1e-6)


def test_jit_trainer_xpred_parity(ref_trainer_mod):
    """training_repa_JiT.REPATrainer pin: x-prediction converted to velocity
    by dividing by clamp(1-t, 5e-2) on BOTH the net output and the target
    (:82,102 — the effective 1/(1-t)^2 loss weighting our old JiTTrainer
    missed), plus the active REPA branch. One injected draw puts base_t at
    sigmoid(3.3)≈0.964 so 1-t < t_eps exercises the clamp."""
    import importlib.util

    import torch

    import jax
    import jax.numpy as jnp

    from deco_tpu.convert.torch_to_flax import convert_deco_c2i
    from deco_tpu.diffusion.scheduling import LinearScheduler
    from deco_tpu.diffusion.training import JiTTrainer
    from deco_tpu.models.dit_c2i_deco import DeCoC2I

    _, TLinear, dit = ref_trainer_mod
    spec = importlib.util.spec_from_file_location(
        "ref_trainer_jit",
        os.path.join(REF, "src/diffusion/flow_matching/training_repa_JiT.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_trainer_jit"] = mod
    spec.loader.exec_module(mod)

    tmodel = dit.PixNerDiT(**KW).eval()
    g = torch.Generator().manual_seed(22)
    with torch.no_grad():
        for p in tmodel.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)

    rs = np.random.RandomState(22)
    batch, hid = 2, KW["hidden_size"]
    x = rs.uniform(-1, 1, (batch, 3, 16, 16)).astype(np.float32)
    y = np.asarray([4, 8])
    # first sample hits the t_eps clamp (sigmoid(3.3)=0.964 -> 1-t=0.036),
    # second stays unclamped
    q_nt = np.asarray([3.3, -0.7], np.float32)
    q_noise = rs.randn(batch, 3, 16, 16).astype(np.float32)
    dst = rs.randn(batch, 16, 24).astype(np.float32)

    with mock.patch.object(
        torch, "randn",
        side_effect=lambda *s, **k: torch.from_numpy(q_nt)), \
            mock.patch.object(
        torch, "randn_like",
        side_effect=lambda t, **k: torch.from_numpy(q_noise)):
        ttrainer = mod.REPATrainer(
            scheduler=TLinear(), lognorm_t=True, timeshift=1.0,
            encoder=torch.nn.Identity(), align_layer=2,
            proj_denoiser_dim=hid, proj_hidden_dim=16, proj_encoder_dim=24,
        )
        with torch.no_grad():
            out_t = ttrainer._impl_trainstep(
                tmodel, None, None, torch.from_numpy(x), torch.from_numpy(y),
                metadata={"raw_image": torch.from_numpy(dst)},
            )
    fm_t, cos_t = float(out_t["fm_loss"]), float(out_t["cos_loss"])

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params = convert_deco_c2i(sd, in_channels=3, patch_size=4)
    jmodel = DeCoC2I(**KW, dtype=jnp.float32, align_layer=2)
    net = lambda xt, t, yy, **kw: jmodel.apply(
        {"params": params}, xt, t, yy, **kw)
    jtrainer = JiTTrainer(
        scheduler=LinearScheduler(), lognorm_t=True, timeshift=1.0,
        encoder=lambda raw: raw, align_layer=2,
        proj_denoiser_dim=hid, proj_hidden_dim=16, proj_encoder_dim=24,
    )
    proj_params = _copy_ref_proj(ttrainer)
    noise_nhwc = jnp.asarray(q_noise.transpose(0, 2, 3, 1))

    def j_normal(rng, shape=None, dtype=jnp.float32):
        return jnp.asarray(q_nt) if shape == (batch,) else noise_nhwc

    with mock.patch.object(jax.random, "normal", side_effect=j_normal):
        losses = jtrainer._impl_trainstep(
            jax.random.PRNGKey(0), net,
            jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(y),
            metadata={"raw_image": jnp.asarray(dst)}, params=proj_params,
        )
    np.testing.assert_allclose(float(losses["fm_loss"]), fm_t,
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(losses["cos_loss"]), cos_t,
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(losses["loss"]),
                               float(out_t["loss"]), rtol=1e-4, atol=1e-6)


def test_cos_align_grad_finite_at_zero_features():
    """sqrt has a NaN gradient at 0 — an all-zero feature tap (a model built
    without align_layer, or a dead proj) must not poison the whole gradient.
    The safe-norm form keeps d(cos_loss)/d(proj) finite at exactly 0."""
    import jax
    import jax.numpy as jnp

    from deco_tpu.diffusion.training import _REPAProj, _cos_align_loss

    proj = _REPAProj(8, 6)
    # zero proj params + zero feat -> src_feature exactly 0
    p0 = jax.tree.map(jnp.zeros_like,
                      proj.init(jax.random.PRNGKey(0),
                                jnp.zeros((1, 1, 4)))["params"])
    feat = jnp.zeros((2, 5, 4))
    meta = {"raw_image": jnp.ones((2, 5, 6))}

    def f(pp):
        return _cos_align_loss(proj, pp, feat, meta, lambda r: r)

    loss, grads = jax.value_and_grad(f)(p0)
    assert bool(jnp.isfinite(loss))
    for leaf in jax.tree.leaves(grads):
        assert bool(jnp.isfinite(leaf).all())
