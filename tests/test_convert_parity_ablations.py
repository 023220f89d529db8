"""Golden parity for the c2i ablation models (baseline DiT, PixNerd c2i)."""

import importlib.util
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not available"
)


def _load(relpath, name):
    spec = importlib.util.spec_from_file_location(name, os.path.join(REF, relpath))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _randomize(torch, model, seed=0):
    g = torch.Generator().manual_seed(seed)
    for p in model.parameters():
        with torch.no_grad():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)


def test_baseline_dit_parity():
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    from deco_tpu.convert.torch_to_flax import convert_baseline_dit
    from deco_tpu.models.dit_c2i_baseline import BaselineDiT

    ref = _load("src/models/transformer/dit_c2i_baseline.py", "ref_baseline")
    kw = dict(in_channels=3, patch_size=4, num_groups=2, hidden_size=32,
              num_blocks=2, num_classes=10)
    tmodel = ref.FlattenDiT(**kw).eval()
    _randomize(torch, tmodel)
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 16, 16).astype(np.float32)
    t = np.asarray([0.3, 0.8], np.float32)
    y = np.asarray([1, 5])
    with torch.no_grad():
        out_t = tmodel(torch.from_numpy(x), torch.from_numpy(t),
                       torch.from_numpy(y)).numpy()
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params = convert_baseline_dit(sd, in_channels=3, patch_size=4)
    jmodel = BaselineDiT(**kw, dtype=jnp.float32)
    out_j = jmodel.apply({"params": params},
                         jnp.asarray(x.transpose(0, 2, 3, 1)),
                         jnp.asarray(t), jnp.asarray(y))
    np.testing.assert_allclose(
        np.asarray(out_j).transpose(0, 3, 1, 2), out_t, atol=5e-4, rtol=1e-3
    )


def test_pixnerd_c2i_parity():
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    from deco_tpu.convert.torch_to_flax import convert_pixnerd_c2i
    from deco_tpu.models.dit_c2i_pixnerd import PixNerdC2I

    ref = _load("src/models/transformer/dit_c2i_pixnerd.py", "ref_pixnerd_c2i")
    kw = dict(in_channels=3, patch_size=4, num_groups=2, hidden_size=32,
              hidden_size_x=8, nerf_mlpratio=2, num_blocks=4,
              num_cond_blocks=2, num_classes=10)
    tmodel = ref.PixNerDiT(**kw).eval()
    _randomize(torch, tmodel, seed=1)
    rng = np.random.RandomState(1)
    x = rng.randn(2, 3, 16, 16).astype(np.float32)
    t = np.asarray([0.2, 0.6], np.float32)
    y = np.asarray([0, 9])
    with torch.no_grad():
        out_t = tmodel(torch.from_numpy(x), torch.from_numpy(t),
                       torch.from_numpy(y)).numpy()
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params = convert_pixnerd_c2i(sd, in_channels=3, patch_size=4)
    jmodel = PixNerdC2I(**kw, dtype=jnp.float32)
    out_j = jmodel.apply({"params": params},
                         jnp.asarray(x.transpose(0, 2, 3, 1)),
                         jnp.asarray(t), jnp.asarray(y))
    np.testing.assert_allclose(
        np.asarray(out_j).transpose(0, 3, 1, 2), out_t, atol=5e-4, rtol=1e-3
    )
