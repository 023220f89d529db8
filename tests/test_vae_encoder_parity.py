"""VAE encoder-path forward parity vs the reference torch VAEModel.

Pins the ENCODER side of ``encoder_ae_sim.VAEModel`` (reference
encoder_ae_sim.py:91-392 — the model the VAE-GAN workload trains) against
``models.vae_models.VAEModel`` with ``convert_vae_encoder``-converted
weights: the InternViT tower with the gen-layer hidden-state tap, CLS
removal + 0.5x pixel shuffle (_process_vit_features), the gen_mlp1
DCDownsampleMLP (group-mean shortcut + zero-init residual MLP), the
RMSNorm+SiLU LatentConnectorModule, and the mlp1 understanding path.

The decoder half is the vendored-diffusers DC-AE, which cannot run in
torch here (real diffusers internals); it is stubbed out of the reference
constructor and excluded from the pin — models/dcae.py has its own tests.

Note the reference's forward hard-codes ``hidden_states[18]`` as the gen
tap (encoder_ae_sim.py:382); the test replicates the tap at the tiny
tower's layer index, which is what 18 means at real scale.
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
           patch_size=14, image_size=56, num_hidden_layers=4,
           qk_normalization=True, norm_type="rms_norm", qkv_bias=False,
           hidden_act="gelu", layer_norm_eps=1e-6, drop_path_rate=0.0,
           initializer_factor=0.1)
LLM_HIDDEN = 40
TAP = 2  # stands in for the reference's hard-coded hidden_states[18]
LATENT = 8


def _install_diffusers_stub(torch):
    """encoder_ae_sim imports diffusers at module scope; provide the three
    names it touches. AutoencoderDC.from_pretrained returns an object with a
    .decoder (never exercised by the encoder-path pin)."""
    from ref_stub_util import ensure_module

    added = []

    def _ensure(name):
        return ensure_module(name, added)

    d = _ensure("diffusers")
    dm = _ensure("diffusers.models")
    da = _ensure("diffusers.models.autoencoders")
    dv = _ensure("diffusers.models.autoencoders.vae")
    do = _ensure("diffusers.models.modeling_outputs")

    class _StubAutoencoderDC:
        decoder = torch.nn.Identity()

        @classmethod
        def from_pretrained(cls, *a, **k):
            return cls()

    if not hasattr(dm, "AutoencoderDC"):
        dm.AutoencoderDC = _StubAutoencoderDC
    for name, mod in (("DecoderOutput", dv),
                      ("DiagonalGaussianDistribution", dv)):
        if not hasattr(mod, name):
            setattr(mod, name, type(name, (), {}))
    if not hasattr(do, "AutoencoderKLOutput"):
        do.AutoencoderKLOutput = type("AutoencoderKLOutput", (), {})
    d.models = dm
    dm.autoencoders = da
    da.vae = dv
    dm.modeling_outputs = do
    return added


@pytest.fixture(scope="module")
def ref_vae(tmp_path_factory):
    torch = pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from ref_stub_util import install_stubs, remove_stubs

    added = install_stubs(torch)
    added += _install_diffusers_stub(torch)
    from src.models.transformer import encoder_ae_sim

    cfg_dir = str(tmp_path_factory.mktemp("tiny_ivl_vae"))
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
    yield encoder_ae_sim, cfg_dir
    remove_stubs(added)


def test_vae_encoder_forward_parity(ref_vae):
    import torch

    import jax.numpy as jnp

    from deco_tpu.convert.torch_to_flax import convert_vae_encoder
    from deco_tpu.models.uniflow.vit import ViTConfig
    from deco_tpu.models.vae_models import VAEModel

    mod, cfg_dir = ref_vae
    tmodel = mod.VAEModel(
        encoder_config_path=cfg_dir, decoder_weight_path="unused",
        latent_channel=LATENT, load_pretrained_encoder=False,
    ).eval().float()
    g = torch.Generator().manual_seed(6)
    with torch.no_grad():
        for p in tmodel.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.2)

    rng = np.random.RandomState(6)
    b = 2
    img = rng.uniform(-1, 1, (b, 3, 56, 56)).astype(np.float32)

    with torch.no_grad():
        # replicate forward() up to the latent (encoder_ae_sim.py:352-392),
        # tapping the tiny tower at TAP instead of the hard-coded 18
        timg = torch.from_numpy(img)
        px = mod.Normalize(mod.IMAGENET_DEFAULT_MEAN,
                           mod.IMAGENET_DEFAULT_STD)(timg * 0.5 + 0.5)
        vision_outputs = tmodel.vision_model(
            pixel_values=px, output_hidden_states=True, return_dict=True)
        gen_features = tmodel._process_vit_features(
            vision_outputs.hidden_states[TAP])
        gen_t = tmodel.gen_mlp1(gen_features)
        latent_t = tmodel.encode_latent(timg, features=gen_t)  # (B,C,H',W')
        feats_t = tmodel.mlp1(tmodel._process_vit_features(
            vision_outputs.last_hidden_state))

    params = convert_vae_encoder(
        {k: v.numpy() for k, v in tmodel.state_dict().items()})
    jmodel = VAEModel(
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
        llm_hidden_size=LLM_HIDDEN, latent_channel=LATENT,
        gen_select_layer=TAP, dtype=jnp.float32,
    )

    from deco_tpu.models.uniflow.components import resample_tokens

    def pin(mdl, x):
        last, tapped = mdl._vit_features(x)
        gen = mdl.gen_mlp1(resample_tokens(tapped, 0.5))
        latent, _ = mdl.encode_latent(gen)
        feats = mdl.mlp1(resample_tokens(last, 0.5))
        return gen, latent, feats

    gen_j, latent_j, feats_j = jmodel.apply(
        {"params": params}, jnp.asarray(img.transpose(0, 2, 3, 1)),
        method=pin,
    )
    # reference latent is reshaped to (B, C, H', W'); ours stays (B, N, C)
    lt = latent_t.numpy()
    lt_tokens = lt.reshape(b, LATENT, -1).transpose(0, 2, 1)
    for name, j, t in (("gen_mlp1", gen_j, gen_t.numpy()),
                       ("latent", latent_j, lt_tokens),
                       ("mlp1_features", feats_j, feats_t.numpy())):
        atol = max(5e-4, 1e-6 * float(np.abs(t).max()))
        np.testing.assert_allclose(
            np.asarray(j), t, atol=atol, rtol=1e-3, err_msg=name)
