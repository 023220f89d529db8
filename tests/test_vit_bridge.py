"""InternViT weight-bridge tests.

timm (a reference InternViT dependency) is not installed in this environment,
so full torch-forward parity is not runnable; instead the bridge is validated
by (a) exact round-trip identity through the torch naming, (b) loading
bridged weights into the Flax model and checking shapes/finite forward, and
(c) the torch state-dict key set matching the InternVisionModel convention.
"""

import jax
import jax.numpy as jnp
import numpy as np

from deco_tpu.convert.vit_bridge import (
    export_internvl_folder,
    vit_params_from_torch,
    vit_params_to_torch,
)
from deco_tpu.models.uniflow.vit import ViTConfig, VisionModel


def make_model(norm_type="layer_norm", qk_norm=False):
    cfg = ViTConfig(hidden_size=32, num_layers=3, num_heads=4,
                    intermediate_size=64, patch_size=4, image_size=16,
                    qkv_bias=True, qk_normalization=qk_norm,
                    norm_type=norm_type)
    model = VisionModel(cfg, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    return cfg, model, params


class TestBridge:
    def test_roundtrip_identity(self):
        cfg, model, params = make_model()
        sd = vit_params_to_torch(params)
        back = vit_params_from_torch(sd, num_layers=cfg.num_layers)
        flat_a = dict(jax.tree_util.tree_flatten_with_path(params["params"])[0])
        flat_b = dict(jax.tree_util.tree_flatten_with_path(back)[0])
        assert set(flat_a) == set(flat_b)
        for k in flat_a:
            np.testing.assert_allclose(flat_a[k], flat_b[k], atol=1e-6,
                                       err_msg=str(k))

    def test_roundtrip_rms_qknorm(self):
        cfg, model, params = make_model(norm_type="rms_norm", qk_norm=True)
        sd = vit_params_to_torch(params, norm_type="rms_norm")
        assert "encoder.layers.0.attn.q_norm.weight" in sd
        back = vit_params_from_torch(sd, num_layers=cfg.num_layers,
                                     norm_type="rms_norm")
        out = model.apply({"params": back}, jnp.zeros((1, 16, 16, 3)))[0]
        assert np.isfinite(np.asarray(out)).all()

    def test_torch_key_convention(self):
        _, _, params = make_model()
        sd = vit_params_to_torch(params)
        expected = {
            "embeddings.class_embedding",
            "embeddings.position_embedding",
            "embeddings.patch_embedding.weight",
            "embeddings.patch_embedding.bias",
            "encoder.layers.0.attn.qkv.weight",
            "encoder.layers.0.attn.qkv.bias",
            "encoder.layers.0.attn.proj.weight",
            "encoder.layers.0.mlp.fc1.weight",
            "encoder.layers.0.norm1.weight",
            "encoder.layers.0.norm1.bias",
            "encoder.layers.0.ls1",
        }
        assert expected <= set(sd)
        # conv back in OIHW
        assert sd["embeddings.patch_embedding.weight"].shape == (32, 3, 4, 4)

    def test_export_folder(self, tmp_path):
        import os

        _, _, params = make_model()
        out = str(tmp_path / "internvl_export")
        export_internvl_folder(
            params, out,
            config={"hidden_size": 32, "num_hidden_layers": 3,
                    "norm_type": "layer_norm"},
            mlp1_state={"0.weight": np.zeros(8, np.float32)},
        )
        assert os.path.exists(os.path.join(out, "pytorch_model.bin"))
        assert os.path.exists(os.path.join(out, "config.json"))
        import torch

        blob = torch.load(os.path.join(out, "pytorch_model.bin"),
                          weights_only=False)
        assert "mlp1.0.weight" in blob["state_dict"]
