"""Golden parity: converted torch weights reproduce the reference forward pass.

Loads the reference torch models directly from /root/reference (read-only,
CPU) via importlib, randomizes their weights, converts the state dict with
deco_tpu.convert, and compares fp32 forward outputs. This validates every
layout subtlety at once: unfold vs patchify ordering, qkv packing, complex vs
cos/sin RoPE, adaLN chunking, the NerfEmbedder bases, and the per-patch
decoder conditioning. Skipped when the reference tree is unavailable.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not available"
)


def _load_ref_module(relpath, name):
    spec = importlib.util.spec_from_file_location(name, os.path.join(REF, relpath))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def torch():
    return pytest.importorskip("torch")


def _randomize(torch, model, seed=0):
    g = torch.Generator().manual_seed(seed)
    for p in model.parameters():
        with torch.no_grad():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    return model


class TestC2IParity:
    def test_deco_c2i_forward_parity(self, torch):
        import jax.numpy as jnp

        from deco_tpu.convert.torch_to_flax import convert_deco_c2i
        from deco_tpu.models.dit_c2i_deco import DeCoC2I

        ref = _load_ref_module(
            "src/models/transformer/dit_c2i_DeCo.py", "ref_dit_c2i_deco"
        )
        kw = dict(in_channels=3, patch_size=4, num_groups=2, hidden_size=32,
                  hidden_size_x=8, num_blocks=4, num_cond_blocks=2, num_classes=10)
        tmodel = ref.PixNerDiT(**kw).eval()
        _randomize(torch, tmodel)

        rng = np.random.RandomState(0)
        x = rng.randn(2, 3, 16, 16).astype(np.float32)
        t = np.asarray([0.3, 0.8], np.float32)
        y = np.asarray([1, 5])
        with torch.no_grad():
            out_t = tmodel(
                torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(y)
            ).numpy()

        sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
        params = convert_deco_c2i(sd, in_channels=3, patch_size=4)
        jmodel = DeCoC2I(**kw, dtype=jnp.float32)
        out_j = jmodel.apply(
            {"params": params},
            jnp.asarray(x.transpose(0, 2, 3, 1)),
            jnp.asarray(t),
            jnp.asarray(y),
        )
        out_j = np.asarray(out_j).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(out_j, out_t, atol=2e-4, rtol=1e-3)

    def test_deco_c2i_parity_other_resolution(self, torch):
        """Same converted weights at 32x32 (RoPE rescale path)."""
        import jax.numpy as jnp

        from deco_tpu.convert.torch_to_flax import convert_deco_c2i
        from deco_tpu.models.dit_c2i_deco import DeCoC2I

        ref = sys.modules.get("ref_dit_c2i_deco") or _load_ref_module(
            "src/models/transformer/dit_c2i_DeCo.py", "ref_dit_c2i_deco"
        )
        kw = dict(in_channels=3, patch_size=4, num_groups=2, hidden_size=32,
                  hidden_size_x=8, num_blocks=4, num_cond_blocks=2, num_classes=10)
        tmodel = ref.PixNerDiT(**kw).eval()
        _randomize(torch, tmodel, seed=1)
        rng = np.random.RandomState(1)
        x = rng.randn(1, 3, 32, 32).astype(np.float32)
        t = np.asarray([0.5], np.float32)
        y = np.asarray([3])
        with torch.no_grad():
            out_t = tmodel(
                torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(y)
            ).numpy()
        sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
        params = convert_deco_c2i(sd, in_channels=3, patch_size=4)
        jmodel = DeCoC2I(**kw, dtype=jnp.float32)
        out_j = jmodel.apply(
            {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)),
            jnp.asarray(t), jnp.asarray(y),
        )
        np.testing.assert_allclose(
            np.asarray(out_j).transpose(0, 3, 1, 2), out_t, atol=2e-4, rtol=1e-3
        )


class TestPrefixHandling:
    def test_clean_and_select(self):
        from deco_tpu.convert.torch_to_flax import clean_key, select_prefix

        assert clean_key("model.module.blocks.0.w") == "model.blocks.0.w"
        assert clean_key("denoiser._orig_mod.blocks.0.w") == "denoiser.blocks.0.w"
        state = {
            "denoiser.a": np.zeros(1),
            "ema_denoiser.a": np.ones(1),
            "diffusion_trainer.b": np.zeros(1),
        }
        assert set(select_prefix(state, "ema_denoiser.")) == {"a"}
        assert float(select_prefix(state, "ema_denoiser.")["a"][0]) == 1.0
