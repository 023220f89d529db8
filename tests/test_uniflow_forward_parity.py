"""End-to-end UniFlow forward parity vs the reference torch model.

Pins the full deterministic compute graph of ``UniFlowVisionModel``
(reference ``src/models/uniflow/modeling_uniflow.py:1227-1677``) against
``deco_tpu.models.uniflow.model.UniFlowVision`` with converted weights:

- ``forward_encoder`` (siglip normalize, shallow + deep InternViT towers,
  condition-gated LatentProjector, param-free layer norm, 0.5x token
  downsample, mlp1) -> (sem_down, sem_after_mlp, latent);
- the pixel trunk (2x token upsample, gen_latent_proj, sincos pos embed,
  global DiT blocks with ex2d RoPE);
- the semantic trunk (sem_latent_proj, causal sem_global_blocks);
- one deterministic velocity evaluation of each FlowDecoder head
  (NerfEmbedder + SimpleMLPAdaLN at fixed x_t, t).

The stochastic parts (logit-normal t draw, noise, Euler sampling) are
protocol-level, not weight-level; everything weight-touching is covered
here. The reference module needs CPU-host shims to import in this image:
timm/torchvision stubs (DropPath at rate 0 = identity, Normalize,
trunc_normal_), a flash_attention stub behind ``has_flash_attn = False``
(upstream hard-codes ``True`` above a commented-out guard,
modeling_uniflow.py:35-46), and a param-free PerceptualLoss (torchvision is
not installed; LPIPS weights are env-gated anyway). All stubs are removed
from sys.modules on teardown.

RoPE note: the reference's ``fetch_pos`` hard-codes head_dim=64
(modeling_uniflow.py:1405-1410) which only matches its real widths
(1024//16 == 2048//32 == 64); the tiny config here computes the same
ex2d table at the config's actual head_dim, which is exactly what the
hard-coded value evaluates to at real scale.
"""

import os
import shutil
import sys
import numpy as np
import pytest

REF = "/root/reference"
UF = os.path.join(REF, "src", "models", "uniflow")
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not available"
)


@pytest.fixture(scope="module")
def ref_uniflow(tmp_path_factory):
    torch = pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from ref_stub_util import install_stubs, remove_stubs
    added = install_stubs(torch)

    pkg_root = str(tmp_path_factory.mktemp("refuf"))
    d = os.path.join(pkg_root, "refuniflow_pkg")
    os.makedirs(d)
    open(os.path.join(d, "__init__.py"), "w").write("")
    shutil.copy(os.path.join(UF, "configuration_uniflow.py"),
                os.path.join(d, "configuration_uniflow.py"))
    open(os.path.join(d, "flash_attention.py"), "w").write(
        "class FlashAttention:\n"
        "    def __init__(self, *a, **k):\n"
        "        raise RuntimeError('flash_attn unavailable on CPU host')\n"
    )
    text = open(os.path.join(UF, "modeling_uniflow.py"),
                errors="ignore").read()
    # upstream CPU-host bug: has_flash_attn hard-coded True above a
    # commented-out import guard (modeling_uniflow.py:35-46)
    patched = text.replace(
        "\nhas_flash_attn = True\n", "\nhas_flash_attn = False\n", 1)
    assert patched != text, "upstream flash guard changed; re-check patch"
    open(os.path.join(d, "modeling_uniflow.py"), "w").write(patched)

    sys.path.insert(0, pkg_root)
    import refuniflow_pkg.modeling_uniflow as M

    yield M
    sys.path.remove(pkg_root)
    for k in list(sys.modules):
        if k.startswith("refuniflow_pkg"):
            del sys.modules[k]
    remove_stubs(added)


# the reference config dict; UniFlowVisionModel.__init__ mutates
# num_hidden_layers to 4 for the shallow tower, so keep a pristine copy
CFG = dict(
    num_channels=3, patch_size=14, image_size=56, qkv_bias=False,
    hidden_size=64, num_attention_heads=4, intermediate_size=128,
    qk_normalization=True, num_hidden_layers=2, use_flash_attn=False,
    hidden_act="gelu", norm_type="rms_norm", layer_norm_eps=1e-6,
    drop_path_rate=0.0, vit_hidden_size=64, llm_hidden_size=32,
    latent_ch=64, global_blocks_depth=1, num_decoder_layers=1,
    num_sampling_steps="2", use_cfg=False,
    # carried via PretrainedConfig **kwargs, as the shipped config.json does
    use_chal_proj=True, decoder_type="mlp",
)


def test_uniflow_forward_parity(ref_uniflow):
    import torch

    import jax.numpy as jnp

    from deco_tpu.convert.uniflow_bridge import uniflow_params_from_torch
    from deco_tpu.models.uniflow.model import UniFlowConfig, UniFlowVision

    M = ref_uniflow
    tcfg = M.UniFlowVisionConfig(**dict(CFG))
    torch.manual_seed(0)
    tmodel = M.UniFlowVisionModel(tcfg).eval().float()
    g = torch.Generator().manual_seed(3)
    with torch.no_grad():
        for p in tmodel.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.2)

    rng = np.random.RandomState(0)
    b = 2
    px = rng.uniform(-1, 1, (b, 3, 56, 56)).astype(np.float32)
    grid = 56 // 14  # pixel-trunk grid (latent grid 2, upsampled x2)
    n_pix, n_sem = grid * grid, (grid // 2) ** 2
    xt_pix = rng.randn(b, n_pix, 3 * 14 * 14).astype(np.float32)
    t_pix = rng.uniform(0, 1, (b, n_pix)).astype(np.float32)
    xt_sem = rng.randn(b, n_sem, 4 * CFG["vit_hidden_size"]).astype(np.float32)
    t_sem = rng.uniform(0, 1, (b, n_sem)).astype(np.float32)

    vh = CFG["vit_hidden_size"]
    with torch.no_grad():
        tpx = torch.from_numpy(px)
        sem_down_t, sem_mlp_t, latent_t = tmodel.forward_encoder(tpx)

        # pixel trunk, replicated step-for-step from forward_pixel_decoder
        # (modeling_uniflow.py:1522-1543) with the ex2d RoPE fetch_pos
        # evaluates to at real scale (head_dim = width//16)
        lat_up = M.upsample_tokens(latent_t, scale_factor=2)
        cond_t = tmodel.gen_latent_proj(lat_up)
        cond_t = cond_t + tmodel._get_pos_embed(
            tmodel.global_block_pos_embed, grid, grid)
        pos = M.precompute_freqs_cis_2d(vh // 16, grid, grid)
        for blk in tmodel.global_blocks:
            cond_t = blk(cond_t, pos)
        z_t = tmodel.flow_head.nerf_embedder(cond_t)
        v_pix_t = tmodel.flow_head.net(
            torch.from_numpy(xt_pix).reshape(b * n_pix, -1),
            torch.from_numpy(t_pix).reshape(-1) * 1000.0,
            z_t.reshape(b * n_pix, -1),
        ).reshape(b, n_pix, -1)

        # semantic trunk (forward_semantic_decoder :1479-1513)
        sem_cond_t = tmodel.sem_latent_proj(latent_t)
        gs = grid // 2
        sem_cond_t = sem_cond_t + tmodel._get_pos_embed(
            tmodel.sem_global_block_pos_embed, gs, gs)
        pos_s = M.precompute_freqs_cis_2d(2 * vh // 32, gs, gs)
        for blk in tmodel.sem_global_blocks:
            sem_cond_t = blk(sem_cond_t, pos_s)
        zs_t = tmodel.sem_flow_head.nerf_embedder(sem_cond_t)
        v_sem_t = tmodel.sem_flow_head.net(
            torch.from_numpy(xt_sem).reshape(b * n_sem, -1),
            torch.from_numpy(t_sem).reshape(-1) * 1000.0,
            zs_t.reshape(b * n_sem, -1),
        ).reshape(b, n_sem, -1)

    sd = {"model." + k: v.numpy() for k, v in tmodel.state_dict().items()}
    params = uniflow_params_from_torch(sd)

    jcfg = UniFlowConfig.from_dict(dict(CFG))
    jmodel = UniFlowVision(jcfg, dtype=jnp.float32)

    def pin(mdl, px_nhwc, xt_p, t_p, xt_s, t_s):
        sem_down, sem_mlp, latent = mdl.forward_encoder(px_nhwc)
        cond, _ = mdl._run_pixel_trunk(latent)
        z = mdl.flow_head.nerf_embedder(cond)
        v_pix = mdl.flow_head.net(xt_p, t_p * 1000.0, z)
        sem_cond, _ = mdl._run_semantic_trunk(latent)
        zs = mdl.sem_flow_head.nerf_embedder(sem_cond)
        v_sem = mdl.sem_flow_head.net(xt_s, t_s * 1000.0, zs)
        return sem_down, sem_mlp, latent, cond, v_pix, sem_cond, v_sem

    outs = jmodel.apply(
        {"params": params},
        jnp.asarray(px.transpose(0, 2, 3, 1)),
        jnp.asarray(xt_pix), jnp.asarray(t_pix),
        jnp.asarray(xt_sem), jnp.asarray(t_sem),
        method=pin,
    )
    names = ("sem_down", "sem_after_mlp", "latent", "pixel_trunk",
             "v_pixel", "sem_trunk", "v_sem")
    refs = (sem_down_t, sem_mlp_t, latent_t, cond_t, v_pix_t,
            sem_cond_t, v_sem_t)
    for name, j, t in zip(names, outs, refs):
        t = t.numpy()
        # scale-aware atol: the 0.2-scale random weights (chosen large enough
        # that a wrong RoPE table is visible above the residual stream)
        # amplify the width-2048 sem head to |v| ~ 1e4, where 1e-6 relative
        # fp32 reduction-order noise is ~1e-2 absolute
        atol = max(5e-4, 1e-6 * float(np.abs(t).max()))
        np.testing.assert_allclose(
            np.asarray(j), t, atol=atol, rtol=1e-3, err_msg=name,
        )


@pytest.mark.parametrize("schedule", ["linear", "pow_0.25"])
def test_flow_decoder_sampling_parity(ref_uniflow, schedule):
    """Pins the FlowDecoder INFERENCE Euler loop (modeling_uniflow.py:852-925)
    at cfg==1 — the only upstream-executable CFG setting (the reference's
    mask_token is commented out of __init__, so its cfg branch crashes):
    the linear and pow_p timestep/interval tables, the x1000 time scaling,
    the per-step x += dt*v update, and the channel-major l2p reassembly,
    with the noise draw injected on both sides (the reference hard-codes
    .cuda(); Tensor.cuda is patched to identity for the call)."""
    from unittest import mock

    import torch

    import jax
    import jax.numpy as jnp

    from deco_tpu.convert.uniflow_bridge import _flow_decoder
    from deco_tpu.models.uniflow.flow_decoder import FlowDecoder

    M = ref_uniflow
    b, n, cz, patch = 2, 4, 16, 2
    tfd = M.FlowDecoder(
        target_channels=3 * patch * patch, z_channels=cz, depth=1, width=16,
        num_sampling_steps="4", patch_size=patch, max_freqs=4, num_heads=2,
        use_lpips=False,
    ).eval()
    g = torch.Generator().manual_seed(41)
    with torch.no_grad():
        for p in tfd.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.2)

    rs = np.random.RandomState(41)
    z = rs.randn(b, n, cz).astype(np.float32)
    x0 = rs.randn(b * n, 3 * patch * patch).astype(np.float32)

    with mock.patch.object(
            torch, "randn",
            side_effect=lambda *s, **k: torch.from_numpy(x0)), \
            mock.patch.object(torch.Tensor, "cuda",
                              lambda self, *a, **k: self), \
            torch.no_grad():
        img_t = tfd(torch.from_numpy(z), None, schedule=schedule,
                    cfg=1.0).numpy()

    sd = {k: v.numpy() for k, v in tfd.state_dict().items()}
    params = _flow_decoder(sd, "", cz)
    jfd = FlowDecoder(target_channels=3 * patch * patch, z_channels=cz,
                      width=16, depth=1, num_sampling_steps=4,
                      patch_size=patch, max_freqs=4, dtype=jnp.float32)

    def j_normal(rng, shape=None, dtype=jnp.float32):
        return jnp.asarray(x0.reshape(b, n, -1))

    with mock.patch.object(jax.random, "normal", side_effect=j_normal):
        img_j = jfd.apply({"params": params}, jnp.asarray(z),
                          jax.random.PRNGKey(0), schedule=schedule, cfg=1.0,
                          method=FlowDecoder.sample)
    tol = 1e-6 * max(1.0, float(np.abs(img_t).max()))
    np.testing.assert_allclose(np.transpose(np.asarray(img_j), (0, 3, 1, 2)),
                               img_t, atol=tol, rtol=2e-5)
