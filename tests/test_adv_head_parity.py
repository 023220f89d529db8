"""Adversarial-head forward parity vs the reference torch module.

Reference ``src/models/layers/adv_head.py`` (orphaned upstream — zero call
sites) is pure torch, so it imports directly from the reference tree with
no shims. Random converted weights, fp32, tiny 16x16 token grids.
"""

import importlib.util
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF_FILE = "/root/reference/src/models/layers/adv_head.py"
pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_FILE), reason="reference tree not available"
)

HIDDEN = 32  # GroupNorm(32) requires hidden % 32 == 0
IM_C, MM_C, GRID = 16, 24, 16


@pytest.fixture(scope="module")
def ref_mod():
    torch = pytest.importorskip("torch")
    spec = importlib.util.spec_from_file_location("ref_adv_head", REF_FILE)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _conv(p):  # torch (O, I, kh, kw) -> flax (kh, kw, I, O)
    return {"kernel": jnp.asarray(p.weight.detach().numpy().transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(p.bias.detach().numpy())}


def _norm(p):
    return {"scale": jnp.asarray(p.weight.detach().numpy()),
            "bias": jnp.asarray(p.bias.detach().numpy())}


def _dense(p):  # torch Linear (O, I) -> flax (I, O)
    return {"kernel": jnp.asarray(p.weight.detach().numpy().T),
            "bias": jnp.asarray(p.bias.detach().numpy())}


def _dense_from_1x1conv(p):  # torch Conv2d(1x1) acting post-pool == Dense
    return {"kernel": jnp.asarray(p.weight.detach().numpy()[:, :, 0, 0].T),
            "bias": jnp.asarray(p.bias.detach().numpy())}


def _tower(seq):  # Sequential [0 conv, 1 gn, 2 silu] x3 (+ pool at 9)
    return {
        "conv0": _conv(seq[0]), "norm0": _norm(seq[1]),
        "conv1": _conv(seq[3]), "norm1": _norm(seq[4]),
        "conv2": _conv(seq[6]), "norm2": _norm(seq[7]),
    }


def _tokens(rng, c):
    import torch

    x = rng.randn(2, GRID * GRID, c).astype(np.float32) * 0.5
    return torch.from_numpy(x), jnp.asarray(x)


def test_conv_head_parity(ref_mod):
    import torch

    from deco_tpu.models.gan.adv_head import ConvHead

    torch.manual_seed(0)
    ref = ref_mod.ConvHead(IM_C, HIDDEN).eval()
    params = {"params": {
        "tower": _tower(ref.head),
        "out": _dense_from_1x1conv(ref.head[10]),
    }}
    xt, xj = _tokens(np.random.RandomState(0), IM_C)
    with torch.no_grad():
        want = ref(xt).reshape(2, -1).numpy()
    got = np.asarray(ConvHead(HIDDEN).apply(params, xj))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_conv_linear_mm_head_parity(ref_mod):
    import torch

    from deco_tpu.models.gan.adv_head import ConvLinearMMHead

    torch.manual_seed(1)
    ref = ref_mod.ConvLinearMMHead(IM_C, MM_C, HIDDEN).eval()
    params = {"params": {
        "conv_head": _tower(ref.conv_head),
        "lin0": _dense(ref.linear_head[0]),
        "lin1": _dense(ref.linear_head[2]),
        "out": _dense(ref.out),
    }}
    xt, xj = _tokens(np.random.RandomState(1), IM_C)
    mm = np.random.RandomState(2).randn(2, MM_C).astype(np.float32)
    with torch.no_grad():
        want = ref(xt, torch.from_numpy(mm)).reshape(2, -1).numpy()
    got = np.asarray(ConvLinearMMHead(HIDDEN).apply(params, xj, jnp.asarray(mm)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_conv_mm_head_parity(ref_mod):
    import torch

    from deco_tpu.models.gan.adv_head import ConvMMHead

    torch.manual_seed(2)
    ref = ref_mod.ConvMMHead(IM_C, MM_C, HIDDEN).eval()
    params = {"params": {
        "conv1_head": _tower(ref.conv1_head),
        "conv2_head": _tower(ref.conv2_head),
        "out": _dense(ref.out),
    }}
    xt, xj = _tokens(np.random.RandomState(3), IM_C)
    mt, mj = _tokens(np.random.RandomState(4), MM_C)
    with torch.no_grad():
        want = ref(xt, mt).reshape(2, -1).numpy()
    got = np.asarray(ConvMMHead(HIDDEN).apply(params, xj, mj))
    np.testing.assert_allclose(got, want, atol=1e-5)
