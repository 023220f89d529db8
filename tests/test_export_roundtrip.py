"""Export round-trip: flax -> torch state dict -> flax reproduces params,
and the torch dict matches the reference model's key set exactly."""

import importlib.util
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deco_tpu.convert.flax_to_torch import export_checkpoint, export_deco_c2i
from deco_tpu.convert.torch_to_flax import convert_deco_c2i, select_prefix
from deco_tpu.models.dit_c2i_deco import DeCoC2I

KW = dict(in_channels=3, patch_size=4, num_groups=2, hidden_size=32,
          hidden_size_x=8, num_blocks=4, num_cond_blocks=2, num_classes=10)


@pytest.fixture(scope="module")
def params():
    model = DeCoC2I(**KW)
    return model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)), jnp.zeros((1,)),
        jnp.zeros((1,), jnp.int32),
    )["params"]


class TestRoundTrip:
    def test_flax_torch_flax_identity(self, params):
        sd = export_deco_c2i(params, in_channels=3, patch_size=4, prefix="")
        back = convert_deco_c2i(sd, in_channels=3, patch_size=4)
        flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
        flat_b = dict(jax.tree_util.tree_flatten_with_path(back)[0])
        # compare every leaf the export covers (y_embedder etc. included)
        for path, leaf in flat_a:
            assert path in flat_b, path
            np.testing.assert_allclose(leaf, flat_b[path], atol=1e-6,
                                       err_msg=str(path))

    def test_key_set_matches_reference_model(self, params):
        """Exported names == the reference torch model's state_dict keys."""
        torch = pytest.importorskip("torch")
        ref_path = "/root/reference/src/models/transformer/dit_c2i_DeCo.py"
        if not os.path.exists(ref_path):
            pytest.skip("reference unavailable")
        spec = importlib.util.spec_from_file_location("ref_dit2", ref_path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules["ref_dit2"] = mod
        spec.loader.exec_module(mod)
        tmodel = mod.PixNerDiT(**KW)
        ref_keys = set(tmodel.state_dict().keys())
        exported = set(export_deco_c2i(params, in_channels=3, patch_size=4,
                                       prefix="").keys())
        assert exported == ref_keys, (
            f"missing={sorted(ref_keys - exported)[:5]} "
            f"extra={sorted(exported - ref_keys)[:5]}"
        )

    def test_lightning_layout(self, params):
        out = export_checkpoint(params, ema_params=params, in_channels=3,
                                patch_size=4)
        assert any(k.startswith("denoiser.") for k in out)
        assert any(k.startswith("ema_denoiser.") for k in out)
        sub = select_prefix(out, "ema_denoiser.")
        assert "s_embedder.proj.weight" in sub


class TestT2IRoundTrip:
    def test_t2i_flax_torch_flax_identity(self):
        import jax

        from deco_tpu.convert.flax_to_torch import export_deco_t2i
        from deco_tpu.convert.torch_to_flax import convert_deco_t2i
        from deco_tpu.models.dit_t2i import DeCoT2I

        kw = dict(in_channels=3, patch_size=4, num_groups=2, hidden_size=32,
                  decoder_hidden_size=8, num_encoder_blocks=2,
                  num_decoder_blocks=1, num_text_blocks=1, txt_embed_dim=16,
                  txt_max_length=6)
        model = DeCoT2I(**kw)
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)), jnp.zeros((1,)),
            jnp.zeros((1, 6, 16)),
        )["params"]
        sd = export_deco_t2i(params, in_channels=3, patch_size=4, prefix="")
        back = convert_deco_t2i(sd, in_channels=3, patch_size=4,
                                num_encoder_blocks=2, num_text_blocks=1)
        flat_a = dict(jax.tree_util.tree_flatten_with_path(params)[0])
        flat_b = dict(jax.tree_util.tree_flatten_with_path(back)[0])
        assert set(flat_a) == set(flat_b), (
            sorted(set(map(str, flat_a)) - set(map(str, flat_b)))[:3],
            sorted(set(map(str, flat_b)) - set(map(str, flat_a)))[:3],
        )
        for k in flat_a:
            np.testing.assert_allclose(flat_a[k], flat_b[k], atol=1e-6,
                                       err_msg=str(k))
