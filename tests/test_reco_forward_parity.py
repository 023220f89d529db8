"""ReCo forward parity vs the reference torch snapshot class.

Pins ``dit_t2i_DeCo.PixNerDiT`` (the mid-research ReCo reconstruction model,
reference dit_t2i_DeCo.py:469-633) against :class:`models.reco.ReCoModel`
with weights converted by ``convert.torch_to_flax.convert_reco``: the frozen
truncated InternViT tower, mlp1 connector, latent projector, the
PixelDecoder condition path (learnable tokens with center-position RoPE,
plain DiT blocks over the ex2d table), and the full denoiser forward
``net(x_t, t, s)`` through the t2i NerfEmbedder + SimpleMLPAdaLN.

The reference file imports timm/torchvision on a CPU host — shimmed via
tests.ref_stub_util (removed from sys.modules on teardown). The model needs
an InternVL config directory; a tiny one is synthesized.
"""

import json
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not available"
)

VIT = dict(hidden_size=48, num_attention_heads=4, intermediate_size=96,
           patch_size=14, image_size=56, num_hidden_layers=3,
           qk_normalization=True, norm_type="rms_norm", qkv_bias=False,
           hidden_act="gelu", layer_norm_eps=1e-6, drop_path_rate=0.0,
           initializer_factor=0.1)
LLM_HIDDEN = 40
SELECT_LAYER = 2  # truncates the ViT tower (reference :496-500)


@pytest.fixture(scope="module")
def ref_reco(tmp_path_factory):
    torch = pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from ref_stub_util import install_stubs, remove_stubs

    added = install_stubs(torch)
    from src.models.transformer import dit_t2i_DeCo

    cfg_dir = str(tmp_path_factory.mktemp("tiny_ivl_cfg"))
    json.dump(
        {
            "model_type": "internvl_chat",
            "vision_config": {
                "architectures": ["InternVisionModel"], **VIT,
            },
            "llm_config": {
                "architectures": ["Qwen2ForCausalLM"],
                "hidden_size": LLM_HIDDEN,
            },
        },
        open(os.path.join(cfg_dir, "config.json"), "w"),
    )
    yield dit_t2i_DeCo, cfg_dir
    remove_stubs(added)


def test_reco_forward_parity(ref_reco):
    import torch

    import jax.numpy as jnp

    from deco_tpu.convert.torch_to_flax import convert_reco
    from deco_tpu.models.reco import ReCoModel
    from deco_tpu.models.uniflow.vit import ViTConfig

    mod, cfg_dir = ref_reco
    kw = dict(in_channels=3, num_groups=4, hidden_size=64, hidden_size_x=16,
              num_encoder_blocks=2, num_decoder_blocks=2)
    tmodel = mod.PixNerDiT(
        **kw, patch_size=14, config_path=cfg_dir, select_layer=SELECT_LAYER,
    ).eval().float()
    g = torch.Generator().manual_seed(4)
    with torch.no_grad():
        for p in tmodel.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.2)

    rng = np.random.RandomState(4)
    b = 2
    img = rng.uniform(-1, 1, (b, 3, 56, 56)).astype(np.float32)
    xt = rng.randn(b, 3, 56, 56).astype(np.float32)
    tv = rng.uniform(0, 1, (b,)).astype(np.float32)

    with torch.no_grad():
        timg = torch.from_numpy(img)
        feats_t = tmodel.extract_feature(timg)
        s_t = tmodel.forward_condition(timg)
        out_t = tmodel(torch.from_numpy(xt), torch.from_numpy(tv), s_t)

    params = convert_reco(
        {k: v.numpy() for k, v in tmodel.state_dict().items()})
    jmodel = ReCoModel(
        vit=ViTConfig(
            hidden_size=VIT["hidden_size"],
            num_layers=VIT["num_hidden_layers"],
            num_heads=VIT["num_attention_heads"],
            intermediate_size=VIT["intermediate_size"],
            patch_size=VIT["patch_size"], image_size=VIT["image_size"],
            qkv_bias=VIT["qkv_bias"],
            qk_normalization=VIT["qk_normalization"],
            norm_type=VIT["norm_type"],
        ),
        **kw, select_layer=SELECT_LAYER, llm_hidden_size=LLM_HIDDEN,
        dtype=jnp.float32,
    )

    def pin(mdl, img_nhwc, x_nhwc, t):
        feats = mdl.extract_feature(img_nhwc)
        s = mdl.forward_condition(img_nhwc)
        out = mdl(x_nhwc, t, s)
        return feats, s, out

    feats_j, s_j, out_j = jmodel.apply(
        {"params": params},
        jnp.asarray(img.transpose(0, 2, 3, 1)),
        jnp.asarray(xt.transpose(0, 2, 3, 1)),
        jnp.asarray(tv),
        method=pin,
    )
    for name, j, t in (("extract_feature", feats_j, feats_t),
                       ("condition", s_j, s_t),
                       ("denoiser_out", None, None)):
        if name == "denoiser_out":
            j, t = np.asarray(out_j).transpose(0, 3, 1, 2), out_t
        t = np.asarray(t)
        atol = max(5e-4, 1e-6 * float(np.abs(t).max()))
        np.testing.assert_allclose(
            np.asarray(j), t, atol=atol, rtol=1e-3, err_msg=name)
