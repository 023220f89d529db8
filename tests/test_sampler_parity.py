"""End-to-end sampling parity: reference torch EulerSampler + torch model vs
deco_tpu scan sampler + converted weights, with injected identical noise.

This pins the BASELINE 'per-step velocity parity' contract across the whole
inference stack: CFG batching order, guidance interval semantics, timestep
respacing, the score-from-velocity formula, and the model forward."""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not available"
)


@pytest.fixture(scope="module")
def ref_mods():
    pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from src.diffusion.base.guidance import simple_guidance_fn
    from src.diffusion.flow_matching.sampling import EulerSampler, ode_step_fn
    from src.diffusion.flow_matching.scheduling import LinearScheduler
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_dit_sampler", os.path.join(
            REF, "src/models/transformer/dit_c2i_DeCo.py")
    )
    dit = importlib.util.module_from_spec(spec)
    sys.modules["ref_dit_sampler"] = dit
    spec.loader.exec_module(dit)
    return dict(EulerSampler=EulerSampler, LinearScheduler=LinearScheduler,
                guidance_fn=simple_guidance_fn, ode_step_fn=ode_step_fn,
                dit=dit)


KW = dict(in_channels=3, patch_size=4, num_groups=2, hidden_size=32,
          hidden_size_x=8, num_blocks=4, num_cond_blocks=2, num_classes=10)


def test_euler_cfg_sampling_parity(ref_mods):
    import torch

    import jax.numpy as jnp

    from deco_tpu.convert.torch_to_flax import convert_deco_c2i
    from deco_tpu.diffusion.sampling import EulerSampler
    from deco_tpu.diffusion.scheduling import LinearScheduler
    from deco_tpu.models.dit_c2i_deco import DeCoC2I

    tmodel = ref_mods["dit"].PixNerDiT(**KW).eval()
    g = torch.Generator().manual_seed(0)
    for p in tmodel.parameters():
        with torch.no_grad():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)

    rng = np.random.RandomState(0)
    noise = rng.randn(2, 3, 16, 16).astype(np.float32)
    labels = np.asarray([1, 5])
    uncond = np.asarray([10, 10])

    # reference: fp32 (no autocast on CPU), 8 steps, guidance interval
    tsampler = ref_mods["EulerSampler"](
        scheduler=ref_mods["LinearScheduler"](),
        w_scheduler=ref_mods["LinearScheduler"](),
        guidance_fn=ref_mods["guidance_fn"],
        num_steps=8, guidance=3.2,
        guidance_interval_min=0.1, guidance_interval_max=1.0,
        step_fn=ref_mods["ode_step_fn"],
    )
    with torch.no_grad():
        x_trajs, v_trajs = tsampler._impl_sampling(
            tmodel, torch.from_numpy(noise), torch.from_numpy(labels),
            torch.from_numpy(uncond),
        )
    out_t = x_trajs[-1].numpy()
    v_t = torch.stack(v_trajs).numpy()

    # deco_tpu: converted weights, same protocol, NHWC
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params = convert_deco_c2i(sd, in_channels=3, patch_size=4)
    jmodel = DeCoC2I(**KW, dtype=jnp.float32)
    net = lambda x, t, y: jmodel.apply({"params": params}, x, t, y)
    jsampler = EulerSampler(
        scheduler=LinearScheduler(), w_scheduler=LinearScheduler(),
        num_steps=8, guidance=3.2,
        guidance_interval_min=0.1, guidance_interval_max=1.0,
    )
    out_j, xj, vj = jsampler(
        net, jnp.asarray(noise.transpose(0, 2, 3, 1)),
        jnp.asarray(labels), jnp.asarray(uncond),
        return_x_trajs=True, return_v_trajs=True,
    )
    np.testing.assert_allclose(
        jsampler.timesteps, tsampler.timesteps.numpy(), atol=1e-6
    )
    # per-step velocity parity
    vj_nchw = np.asarray(vj).transpose(0, 1, 4, 2, 3)
    np.testing.assert_allclose(vj_nchw[:-1], v_t[:-1], atol=5e-4, rtol=1e-3)
    # final sample parity
    np.testing.assert_allclose(
        np.asarray(out_j).transpose(0, 3, 1, 2), out_t, atol=1e-3, rtol=1e-3
    )


def test_adamlm_sampling_parity(ref_mods):
    import torch

    import jax.numpy as jnp

    if REF not in sys.path:
        sys.path.insert(0, REF)
    from src.diffusion.flow_matching.adam_sampling import AdamLMSampler as TAdam

    from deco_tpu.convert.torch_to_flax import convert_deco_c2i
    from deco_tpu.diffusion.adam_sampling import AdamLMSampler
    from deco_tpu.diffusion.scheduling import LinearScheduler
    from deco_tpu.models.dit_c2i_deco import DeCoC2I

    tmodel = ref_mods["dit"].PixNerDiT(**KW).eval()
    g = torch.Generator().manual_seed(1)
    for p in tmodel.parameters():
        with torch.no_grad():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)

    rng = np.random.RandomState(1)
    noise = rng.randn(2, 3, 16, 16).astype(np.float32)
    labels = np.asarray([2, 7])
    uncond = np.asarray([10, 10])

    tsampler = TAdam(
        scheduler=ref_mods["LinearScheduler"](),
        guidance_fn=ref_mods["guidance_fn"],
        num_steps=6, guidance=4.0, order=2, timeshift=3.0,
    )
    with torch.no_grad():
        x_trajs, _ = tsampler._impl_sampling(
            tmodel, torch.from_numpy(noise), torch.from_numpy(labels),
            torch.from_numpy(uncond),
        )
    out_t = x_trajs[-1].numpy()

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params = convert_deco_c2i(sd, in_channels=3, patch_size=4)
    jmodel = DeCoC2I(**KW, dtype=jnp.float32)
    net = lambda x, t, y: jmodel.apply({"params": params}, x, t, y)
    jsampler = AdamLMSampler(
        scheduler=LinearScheduler(), num_steps=6, guidance=4.0, order=2,
        timeshift=3.0,
    )
    # coefficient parity against the reference's per-step lists
    for i, row in enumerate(tsampler.solver_coeffs):
        ref_row = np.asarray([float(c) for c in row])
        np.testing.assert_allclose(
            jsampler.solver_coeffs[i, -len(ref_row):], ref_row, atol=1e-5
        )
    out_j = jsampler(
        net, jnp.asarray(noise.transpose(0, 2, 3, 1)),
        jnp.asarray(labels), jnp.asarray(uncond),
    )
    np.testing.assert_allclose(
        np.asarray(out_j).transpose(0, 3, 1, 2), out_t, atol=1e-3, rtol=1e-3
    )


def test_adamlm_t2i_sampling_parity(ref_mods):
    """Full t2i inference-stack pin: reference torch PixNerd-t2i (joint
    image-text attention, TextRefine blocks, NerfBlock decoder) driven by the
    reference AdamLMSampler at the production protocol shape (order 2,
    timeshift 3.0, CFG 4.0 with an embedding-space negative prompt) vs the
    converted deco_tpu model under deco_tpu's AdamLM scan. Extends the c2i
    pins to the t2i family (reference app.py:82-89 protocol)."""
    import torch

    import jax.numpy as jnp

    if REF not in sys.path:
        sys.path.insert(0, REF)
    from src.diffusion.flow_matching.adam_sampling import AdamLMSampler as TAdam
    from src.models.transformer import dit_t2i_pixnerd

    from deco_tpu.convert.torch_to_flax import convert_deco_t2i
    from deco_tpu.diffusion.adam_sampling import AdamLMSampler
    from deco_tpu.diffusion.scheduling import LinearScheduler
    from deco_tpu.models.dit_t2i import PixNerdT2I

    kw = dict(in_channels=3, patch_size=4, num_groups=2, hidden_size=32,
              decoder_hidden_size=8, num_encoder_blocks=2,
              num_decoder_blocks=2, num_text_blocks=1, txt_embed_dim=16,
              txt_max_length=6)
    tmodel = dit_t2i_pixnerd.PixNerDiT(**kw).eval()
    g = torch.Generator().manual_seed(2)
    for p in tmodel.parameters():
        with torch.no_grad():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)

    rng = np.random.RandomState(2)
    noise = rng.randn(2, 3, 16, 16).astype(np.float32)
    # text-embedding conditions: prompt + negative-prompt embeddings
    cond = rng.randn(2, 6, 16).astype(np.float32)
    uncond = rng.randn(2, 6, 16).astype(np.float32)

    tsampler = TAdam(
        scheduler=ref_mods["LinearScheduler"](),
        guidance_fn=ref_mods["guidance_fn"],
        num_steps=6, guidance=4.0, order=2, timeshift=3.0,
    )
    with torch.no_grad():
        x_trajs, _ = tsampler._impl_sampling(
            tmodel, torch.from_numpy(noise), torch.from_numpy(cond),
            torch.from_numpy(uncond),
        )
    out_t = x_trajs[-1].numpy()

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params = convert_deco_t2i(
        sd, in_channels=3, patch_size=4, num_encoder_blocks=2,
        num_text_blocks=1, pixnerd=True,
    )
    jmodel = PixNerdT2I(**kw, nerf_mlpratio=2, dtype=jnp.float32)
    net = lambda x, t, y: jmodel.apply({"params": params}, x, t, y)
    jsampler = AdamLMSampler(
        scheduler=LinearScheduler(), num_steps=6, guidance=4.0, order=2,
        timeshift=3.0,
    )
    out_j = jsampler(
        net, jnp.asarray(noise.transpose(0, 2, 3, 1)),
        jnp.asarray(cond), jnp.asarray(uncond),
    )
    np.testing.assert_allclose(
        np.asarray(out_j).transpose(0, 3, 1, 2), out_t, atol=1e-3, rtol=1e-3
    )


def test_ddim_sampling_parity(ref_mods):
    """DDPM-family pin: reference DDIMSampler (deterministic, discrete-t
    table scheduler) vs deco_tpu's DDIM scan with the same converted model
    (ddpm/ddim_sampling.py:10-52)."""
    import torch

    import jax.numpy as jnp

    if REF not in sys.path:
        sys.path.insert(0, REF)
    from src.diffusion.ddpm.ddim_sampling import DDIMSampler as TDDIM
    from src.diffusion.ddpm.scheduling import DDPMScheduler as TSched

    from deco_tpu.convert.torch_to_flax import convert_deco_c2i
    from deco_tpu.diffusion.ddpm_sampling import DDIMSampler
    from deco_tpu.diffusion.scheduling import DDPMScheduler
    from deco_tpu.models.dit_c2i_deco import DeCoC2I

    tmodel = ref_mods["dit"].PixNerDiT(**KW).eval()
    g = torch.Generator().manual_seed(7)
    for p in tmodel.parameters():
        with torch.no_grad():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)

    rng = np.random.RandomState(7)
    noise = rng.randn(2, 3, 16, 16).astype(np.float32)
    labels = np.asarray([3, 9])
    uncond = np.asarray([10, 10])

    # upstream CPU-host bug: the DDPM table scheduler hard-codes
    # device="cuda" (ddpm/scheduling.py:18); build the same tables on CPU
    from unittest import mock

    orig_linspace = torch.linspace

    def cpu_linspace(*a, **k):
        k.pop("device", None)
        return orig_linspace(*a, **k)

    with mock.patch.object(torch, "linspace", cpu_linspace):
        tsched = TSched()
    tsampler = TDDIM(
        scheduler=tsched, guidance_fn=ref_mods["guidance_fn"],
        num_steps=6, guidance=2.0,
    )
    with torch.no_grad():
        x_trajs, _ = tsampler._impl_sampling(
            tmodel, torch.from_numpy(noise), torch.from_numpy(labels),
            torch.from_numpy(uncond),
        )
    out_t = x_trajs[-1].numpy()

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params = convert_deco_c2i(sd, in_channels=3, patch_size=4)
    jmodel = DeCoC2I(**KW, dtype=jnp.float32)
    net = lambda x, t, y: jmodel.apply({"params": params}, x, t, y)
    jsampler = DDIMSampler(scheduler=DDPMScheduler(), num_steps=6,
                           guidance=2.0)
    out_j = jsampler(
        net, jnp.asarray(noise.transpose(0, 2, 3, 1)),
        jnp.asarray(labels), jnp.asarray(uncond),
    )
    np.testing.assert_allclose(
        np.asarray(out_j).transpose(0, 3, 1, 2), out_t, atol=1e-3, rtol=1e-3
    )


def test_vp_euler_sampling_parity(ref_mods):
    """VP probability-flow Euler pin: reference VPEulerSampler (continuous
    VP scheduler, x1000 train_max_t net timesteps, distinct last step) vs
    deco_tpu's scan (ddpm/vp_sampling.py:16-70)."""
    import torch

    import jax.numpy as jnp

    if REF not in sys.path:
        sys.path.insert(0, REF)
    from src.diffusion.ddpm.scheduling import VPScheduler as TSched
    from src.diffusion.ddpm.vp_sampling import VPEulerSampler as TVP
    from src.diffusion.ddpm.vp_sampling import ode_step_fn as t_ode

    from deco_tpu.convert.torch_to_flax import convert_deco_c2i
    from deco_tpu.diffusion.ddpm_sampling import VPEulerSampler
    from deco_tpu.diffusion.scheduling import VPScheduler
    from deco_tpu.models.dit_c2i_deco import DeCoC2I

    tmodel = ref_mods["dit"].PixNerDiT(**KW).eval()
    g = torch.Generator().manual_seed(8)
    for p in tmodel.parameters():
        with torch.no_grad():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)

    rng = np.random.RandomState(8)
    noise = rng.randn(2, 3, 16, 16).astype(np.float32)
    labels = np.asarray([4, 6])
    uncond = np.asarray([10, 10])

    tsampler = TVP(
        scheduler=TSched(), guidance_fn=ref_mods["guidance_fn"],
        num_steps=6, guidance=2.0, step_fn=t_ode, last_step_fn=t_ode,
    )
    with torch.no_grad():
        x_trajs, _ = tsampler._impl_sampling(
            tmodel, torch.from_numpy(noise), torch.from_numpy(labels),
            torch.from_numpy(uncond),
        )
    out_t = x_trajs[-1].numpy()

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params = convert_deco_c2i(sd, in_channels=3, patch_size=4)
    jmodel = DeCoC2I(**KW, dtype=jnp.float32)
    net = lambda x, t, y: jmodel.apply({"params": params}, x, t, y)
    jsampler = VPEulerSampler(scheduler=VPScheduler(), num_steps=6,
                              guidance=2.0)
    out_j = jsampler(
        net, jnp.asarray(noise.transpose(0, 2, 3, 1)),
        jnp.asarray(labels), jnp.asarray(uncond),
    )
    np.testing.assert_allclose(
        np.asarray(out_j).transpose(0, 3, 1, 2), out_t, atol=1e-3, rtol=1e-3
    )


def test_heun_sampling_parity(ref_mods):
    """Heun predictor-corrector pin vs the reference HeunSampler
    (flow_matching/sampling.py:190-296), exact_heun on."""
    import torch

    import jax.numpy as jnp

    if REF not in sys.path:
        sys.path.insert(0, REF)
    from src.diffusion.flow_matching.sampling import HeunSampler as THeun

    from deco_tpu.convert.torch_to_flax import convert_deco_c2i
    from deco_tpu.diffusion.sampling import HeunSampler
    from deco_tpu.diffusion.scheduling import LinearScheduler
    from deco_tpu.models.dit_c2i_deco import DeCoC2I

    tmodel = ref_mods["dit"].PixNerDiT(**KW).eval()
    g = torch.Generator().manual_seed(9)
    for p in tmodel.parameters():
        with torch.no_grad():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)

    rng = np.random.RandomState(9)
    noise = rng.randn(2, 3, 16, 16).astype(np.float32)
    labels = np.asarray([0, 8])
    uncond = np.asarray([10, 10])

    tsampler = THeun(
        scheduler=ref_mods["LinearScheduler"](),
        guidance_fn=ref_mods["guidance_fn"],
        num_steps=6, guidance=2.0, exact_henu=True,
    )
    with torch.no_grad():
        x_trajs, _ = tsampler._impl_sampling(
            tmodel, torch.from_numpy(noise), torch.from_numpy(labels),
            torch.from_numpy(uncond),
        )
    out_t = x_trajs[-1].numpy()

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params = convert_deco_c2i(sd, in_channels=3, patch_size=4)
    jmodel = DeCoC2I(**KW, dtype=jnp.float32)
    net = lambda x, t, y: jmodel.apply({"params": params}, x, t, y)
    jsampler = HeunSampler(scheduler=LinearScheduler(), num_steps=6,
                           guidance=2.0, exact_heun=True)
    out_j = jsampler(
        net, jnp.asarray(noise.transpose(0, 2, 3, 1)),
        jnp.asarray(labels), jnp.asarray(uncond),
    )
    np.testing.assert_allclose(
        np.asarray(out_j).transpose(0, 3, 1, 2), out_t, atol=1e-3, rtol=1e-3
    )


def test_jit_euler_sampling_parity(ref_mods):
    """JiT x-prediction Euler pin: the net output is converted to velocity as
    (out - x_t)/max(1-t, 5e-2) BEFORE guidance (sampling.py:109-188)."""
    import torch

    import jax.numpy as jnp

    if REF not in sys.path:
        sys.path.insert(0, REF)
    from src.diffusion.flow_matching.sampling import (
        EulerSamplerJiT as TJiT,
        ode_step_fn,
    )

    from deco_tpu.convert.torch_to_flax import convert_deco_c2i
    from deco_tpu.diffusion.sampling import EulerSamplerJiT
    from deco_tpu.diffusion.scheduling import LinearScheduler
    from deco_tpu.models.dit_c2i_deco import DeCoC2I

    tmodel = ref_mods["dit"].PixNerDiT(**KW).eval()
    g = torch.Generator().manual_seed(13)
    for p in tmodel.parameters():
        with torch.no_grad():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)

    rng = np.random.RandomState(13)
    noise = rng.randn(2, 3, 16, 16).astype(np.float32)
    labels = np.asarray([2, 5])
    uncond = np.asarray([10, 10])

    tsampler = TJiT(
        scheduler=ref_mods["LinearScheduler"](),
        guidance_fn=ref_mods["guidance_fn"],
        num_steps=6, guidance=2.5, timeshift=1.5,
        guidance_interval_min=0.1, guidance_interval_max=1.0,
        step_fn=ode_step_fn,
    )
    with torch.no_grad():
        x_trajs, _ = tsampler._impl_sampling(
            tmodel, torch.from_numpy(noise), torch.from_numpy(labels),
            torch.from_numpy(uncond),
        )
    out_t = x_trajs[-1].numpy()

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params = convert_deco_c2i(sd, in_channels=3, patch_size=4)
    jmodel = DeCoC2I(**KW, dtype=jnp.float32)
    net = lambda x, t, y: jmodel.apply({"params": params}, x, t, y)
    jsampler = EulerSamplerJiT(
        scheduler=LinearScheduler(), num_steps=6, guidance=2.5,
        timeshift=1.5, guidance_interval_min=0.1, guidance_interval_max=1.0,
    )
    out_j = jsampler(
        net, jnp.asarray(noise.transpose(0, 2, 3, 1)),
        jnp.asarray(labels), jnp.asarray(uncond),
    )
    np.testing.assert_allclose(
        np.asarray(out_j).transpose(0, 3, 1, 2), out_t, atol=1e-3, rtol=1e-3
    )


def test_lagrange_preint_parity_all_orders(ref_mods):
    """Lagrange pre-integration parity vs the reference oracle at orders
    1-4 (pre_integral.py:4-125), random node times and vector values."""
    import torch

    from deco_tpu.diffusion import pre_integral as ours

    if REF not in sys.path:
        sys.path.insert(0, REF)
    from src.diffusion import pre_integral as ref

    rs = np.random.RandomState(3)
    for order in (1, 2, 3, 4):
        ts = np.sort(rs.uniform(0, 1, order)).astype(np.float64)
        vs = rs.randn(order, 5).astype(np.float64)
        s, e = 0.3, 0.7
        r_out, r_coef = ref.lagrange_preint(
            order, [torch.from_numpy(v) for v in vs],
            [torch.tensor(t) for t in ts], s, e)
        j_out, j_coef = ours.lagrange_preint(order, list(vs), list(ts), s, e)
        np.testing.assert_allclose(
            np.asarray(j_out), r_out.numpy(), atol=1e-12,
            err_msg=f"order {order}")
        np.testing.assert_allclose(
            np.asarray(j_coef), np.asarray([float(c) for c in r_coef]),
            atol=1e-12, err_msg=f"coef order {order}")


@pytest.mark.parametrize("step_fn,last_fn", [("sde", "sde_mean"),
                                             ("sde_preserve", "ode")])
def test_euler_sde_sampling_parity(ref_mods, step_fn, last_fn):
    """Full-loop SDE pin (reference sampling.py:17-24,99-103): the
    score-from-velocity drift, the w-scheduler weighting, and the stochastic
    kick, with the reference fed deco_tpu's OWN noise stream (eps per step is
    reproduced from the sampler's key-splitting so both sides integrate the
    identical SDE path). Covers sde + sde_preserve step fns and a distinct
    last_step_fn."""
    from unittest import mock

    import torch

    import jax
    import jax.numpy as jnp

    from deco_tpu.convert.torch_to_flax import convert_deco_c2i
    from deco_tpu.diffusion import sampling as S
    from deco_tpu.diffusion.scheduling import LinearScheduler
    from deco_tpu.models.dit_c2i_deco import DeCoC2I

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_fm_sampling",
        os.path.join(REF, "src/diffusion/flow_matching/sampling.py"))
    ref_sampling = importlib.util.module_from_spec(spec)
    sys.modules["ref_fm_sampling"] = ref_sampling
    spec.loader.exec_module(ref_sampling)
    t_step = {"sde": ref_sampling.sde_step_fn,
              "sde_mean": ref_sampling.sde_mean_step_fn,
              "sde_preserve": ref_sampling.sde_preserve_step_fn,
              "ode": ref_sampling.ode_step_fn}

    tmodel = ref_mods["dit"].PixNerDiT(**KW).eval()
    g = torch.Generator().manual_seed(7)
    for p in tmodel.parameters():
        with torch.no_grad():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)

    rng = np.random.RandomState(7)
    noise = rng.randn(2, 3, 16, 16).astype(np.float32)
    labels = np.asarray([2, 9])
    uncond = np.asarray([10, 10])
    num_steps = 8

    # reproduce the eps stream our scan will draw (sampler._scan_steps
    # splits rng into one key per step; eps = normal(key, x.shape, x.dtype))
    sde_rng = jax.random.PRNGKey(17)
    keys = jax.random.split(sde_rng, num_steps)
    eps_nhwc = [np.asarray(jax.random.normal(k, (2, 16, 16, 3), jnp.float32))
                for k in keys]
    eps_torch = [torch.from_numpy(e.transpose(0, 3, 1, 2).copy())
                 for e in eps_nhwc]
    draws = iter(eps_torch)

    tsampler = ref_mods["EulerSampler"](
        scheduler=ref_mods["LinearScheduler"](),
        w_scheduler=ref_mods["LinearScheduler"](),
        guidance_fn=ref_mods["guidance_fn"],
        num_steps=num_steps, guidance=2.0,
        guidance_interval_min=0.1, guidance_interval_max=1.0,
        step_fn=t_step[step_fn], last_step_fn=t_step[last_fn],
    )
    with mock.patch.object(torch, "randn_like",
                           side_effect=lambda t, **k: next(draws)), \
            torch.no_grad():
        x_trajs, _ = tsampler._impl_sampling(
            tmodel, torch.from_numpy(noise), torch.from_numpy(labels),
            torch.from_numpy(uncond))
    out_t = x_trajs[-1].numpy()
    # only sde/sde_preserve draw noise (ode and sde_mean are deterministic);
    # the eps stream must line up 1:1 with the stochastic steps taken
    stochastic = {"sde", "sde_preserve"}
    n_stoch = (num_steps - 1) * (step_fn in stochastic) + (
        last_fn in stochastic)
    assert sum(1 for _ in draws) == len(eps_torch) - n_stoch

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params = convert_deco_c2i(sd, in_channels=3, patch_size=4)
    jmodel = DeCoC2I(**KW, dtype=jnp.float32)
    net = lambda x, t, y: jmodel.apply({"params": params}, x, t, y)
    jsampler = S.EulerSampler(
        scheduler=LinearScheduler(), w_scheduler=LinearScheduler(),
        num_steps=num_steps, guidance=2.0,
        guidance_interval_min=0.1, guidance_interval_max=1.0,
        step_fn=step_fn, last_step_fn=last_fn,
    )
    out_j = jsampler(net, jnp.asarray(noise.transpose(0, 2, 3, 1)),
                     jnp.asarray(labels), jnp.asarray(uncond), rng=sde_rng)
    np.testing.assert_allclose(
        np.asarray(out_j).transpose(0, 3, 1, 2), out_t, atol=1e-3, rtol=1e-3)


def test_vp_euler_sde_sampling_parity(ref_mods):
    """VP reverse-SDE pin (ddpm/vp_sampling.py:10-11): drift with k=1 plus
    the sqrt(|dt|*beta) kick, torch fed deco_tpu's own per-step noise stream
    (same key-split reproduction as the FM SDE pin). last_step_fn stays ode —
    the reference evaluates last_step_fn as a side x0 estimate EVERY step
    (:58), so a stochastic last_step_fn would consume extra draws upstream."""
    from unittest import mock

    import torch

    import jax
    import jax.numpy as jnp

    if REF not in sys.path:
        sys.path.insert(0, REF)
    from src.diffusion.ddpm.scheduling import VPScheduler as TSched
    from src.diffusion.ddpm.vp_sampling import VPEulerSampler as TVP
    from src.diffusion.ddpm.vp_sampling import ode_step_fn as t_ode
    from src.diffusion.ddpm.vp_sampling import sde_step_fn as t_sde

    from deco_tpu.convert.torch_to_flax import convert_deco_c2i
    from deco_tpu.diffusion.ddpm_sampling import VPEulerSampler
    from deco_tpu.diffusion.scheduling import VPScheduler
    from deco_tpu.models.dit_c2i_deco import DeCoC2I

    tmodel = ref_mods["dit"].PixNerDiT(**KW).eval()
    g = torch.Generator().manual_seed(9)
    for p in tmodel.parameters():
        with torch.no_grad():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)

    rng = np.random.RandomState(9)
    noise = rng.randn(2, 3, 16, 16).astype(np.float32)
    labels = np.asarray([3, 7])
    uncond = np.asarray([10, 10])
    num_steps = 6

    sde_rng = jax.random.PRNGKey(23)
    keys = jax.random.split(sde_rng, num_steps)
    eps_nhwc = [np.asarray(jax.random.normal(k, (2, 16, 16, 3), jnp.float32))
                for k in keys]
    draws = iter(torch.from_numpy(e.transpose(0, 3, 1, 2).copy())
                 for e in eps_nhwc)

    tsampler = TVP(
        scheduler=TSched(), guidance_fn=ref_mods["guidance_fn"],
        num_steps=num_steps, guidance=2.0, step_fn=t_sde, last_step_fn=t_ode,
    )
    with mock.patch.object(torch, "randn_like",
                           side_effect=lambda t, **k: next(draws)), \
            torch.no_grad():
        x_trajs, _ = tsampler._impl_sampling(
            tmodel, torch.from_numpy(noise), torch.from_numpy(labels),
            torch.from_numpy(uncond))
    out_t = x_trajs[-1].numpy()

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params = convert_deco_c2i(sd, in_channels=3, patch_size=4)
    jmodel = DeCoC2I(**KW, dtype=jnp.float32)
    net = lambda x, t, y: jmodel.apply({"params": params}, x, t, y)
    jsampler = VPEulerSampler(scheduler=VPScheduler(), num_steps=num_steps,
                              guidance=2.0, step_fn="sde", last_step_fn="ode")
    out_j = jsampler(net, jnp.asarray(noise.transpose(0, 2, 3, 1)),
                     jnp.asarray(labels), jnp.asarray(uncond), rng=sde_rng)
    np.testing.assert_allclose(
        np.asarray(out_j).transpose(0, 3, 1, 2), out_t, atol=1e-3, rtol=1e-3)
