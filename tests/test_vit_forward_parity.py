"""InternViT forward parity: bridged torch weights reproduce the reference
InternVisionModel forward (timm's DropPath is stubbed — all shipped configs
run drop_path_rate=0.0 where it is the identity)."""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not available"
)


@pytest.fixture(scope="module")
def ref_vit():
    torch = pytest.importorskip("torch")
    # stub timm (not installed): DropPath at rate 0 is identity
    if "timm" not in sys.modules:
        import importlib.machinery

        def _mod(name):
            m = types.ModuleType(name)
            m.__spec__ = importlib.machinery.ModuleSpec(name, None)
            return m

        timm = _mod("timm")
        models = _mod("timm.models")
        layers = _mod("timm.models.layers")

        class DropPath(torch.nn.Identity):
            def __init__(self, *a, **k):
                super().__init__()

        layers.DropPath = DropPath
        models.layers = layers
        timm.models = models
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = models
        sys.modules["timm.models.layers"] = layers
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from src.models.transformer.configuration_intern_vit import InternVisionConfig
    from src.models.transformer.modeling_intern_vit import InternVisionModel

    return InternVisionConfig, InternVisionModel


def test_vit_forward_parity(ref_vit):
    import torch

    import jax.numpy as jnp

    from deco_tpu.convert.vit_bridge import vit_params_from_torch
    from deco_tpu.models.uniflow.vit import ViTConfig, VisionModel

    InternVisionConfig, InternVisionModel = ref_vit
    cfg_t = InternVisionConfig(
        hidden_size=64, num_attention_heads=4, intermediate_size=128,
        num_hidden_layers=3, patch_size=4, image_size=32, qkv_bias=True,
        qk_normalization=True, norm_type="rms_norm", use_flash_attn=False,
        drop_path_rate=0.0, attention_dropout=0.0, dropout=0.0,
        initializer_factor=0.1, hidden_act="gelu", layer_norm_eps=1e-6,
    )
    tmodel = InternVisionModel(cfg_t).eval()
    g = torch.Generator().manual_seed(0)
    for p in tmodel.parameters():
        with torch.no_grad():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        out_t = tmodel(
            pixel_values=torch.from_numpy(x), return_dict=True
        ).last_hidden_state.numpy()

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params = vit_params_from_torch(sd, num_layers=3, norm_type="rms_norm")
    jcfg = ViTConfig(
        hidden_size=64, num_layers=3, num_heads=4, intermediate_size=128,
        patch_size=4, image_size=32, qkv_bias=True, qk_normalization=True,
        norm_type="rms_norm",
    )
    jmodel = VisionModel(jcfg, dtype=jnp.float32)
    out_j, _ = jmodel.apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(np.asarray(out_j), out_t, atol=5e-4, rtol=1e-3)
