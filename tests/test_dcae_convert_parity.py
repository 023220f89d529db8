"""DC-AE forward parity vs the reference's vendored modeling_dcae.py.

Pins ``deco_tpu.models.dcae.DCAEEncoder/DCAEDecoder`` + the
``convert.dcae_bridge`` weight mapping against the reference's vendored
AutoencoderDC building blocks (``src/models/uniflow/modeling_dcae.py:428-605``
— the decoder the VAE-GAN and UniFlow DCAE-variant pixel branches decode
through), run in-process on CPU with random weights.

The vendored file imports a handful of classes from diffusers (not installed
in this image): ``RMSNorm`` / ``get_normalization`` / ``GLUMBConv`` /
``get_activation`` are replicated here faithfully from diffusers v0.32
(eps 1e-5 + zeros-init bias for get_normalization's rms_norm — the layout
published Sana DC-AE state dicts carry), so those internals are shim-defined
while everything reference-owned (stage layout, shortcut semantics, the
ex2d RoPE table, qk-norm-after-RoPE over flattened heads, pixel-(un)shuffle
channel order, Sequential element order) is pinned against the vendored
code itself. The reference's FlashAttention wrapper (CUDA-only) is replaced
by an exact-softmax CPU equivalent of the same (B,S,3,H,D) interface.
"""

import os
import shutil
import sys

import numpy as np
import pytest

REF = "/root/reference"
DCAE = os.path.join(REF, "src", "models", "uniflow", "modeling_dcae.py")
pytestmark = pytest.mark.skipif(
    not os.path.isfile(DCAE), reason="reference tree not available"
)

sys.path.insert(0, os.path.dirname(__file__))


def _install_diffusers_shim(torch, added):
    """Faithful CPU implementations of the diffusers symbols modeling_dcae
    imports at module scope (diffusers v0.32 semantics)."""
    import types

    from ref_stub_util import ensure_module

    nn = torch.nn

    class RMSNorm(nn.Module):
        def __init__(self, dim, eps, elementwise_affine=True, bias=False):
            super().__init__()
            self.eps = eps
            self.weight = None
            self.bias = None
            if elementwise_affine:
                self.weight = nn.Parameter(torch.ones(dim))
                if bias:
                    self.bias = nn.Parameter(torch.zeros(dim))

        def forward(self, x):
            dt = x.dtype
            var = x.to(torch.float32).pow(2).mean(-1, keepdim=True)
            x = x.to(torch.float32) * torch.rsqrt(var + self.eps)
            if self.weight is not None:
                x = x * self.weight
                if self.bias is not None:
                    x = x + self.bias
            return x.to(dt)

    def get_normalization(norm_type="batch_norm", num_features=None,
                          eps=1e-5, elementwise_affine=True, bias=True):
        if norm_type == "rms_norm":
            return RMSNorm(num_features, eps=eps,
                           elementwise_affine=elementwise_affine, bias=bias)
        if norm_type == "layer_norm":
            return nn.LayerNorm(num_features, eps=eps,
                                elementwise_affine=elementwise_affine,
                                bias=bias)
        if norm_type == "batch_norm":
            return nn.BatchNorm2d(num_features, eps=eps,
                                  affine=elementwise_affine)
        raise ValueError(norm_type)

    def get_activation(name):
        return {"silu": nn.SiLU(), "relu": nn.ReLU(),
                "relu6": nn.ReLU6(), "gelu": nn.GELU()}[name]

    class GLUMBConv(nn.Module):
        def __init__(self, in_channels, out_channels, expand_ratio=4,
                     norm_type=None, residual_connection=True):
            super().__init__()
            hidden = int(expand_ratio * in_channels)
            self.norm_type = norm_type
            self.residual_connection = residual_connection
            self.nonlinearity = nn.SiLU()
            self.conv_inverted = nn.Conv2d(in_channels, hidden * 2, 1, 1, 0)
            self.conv_depth = nn.Conv2d(hidden * 2, hidden * 2, 3, 1, 1,
                                        groups=hidden * 2)
            self.conv_point = nn.Conv2d(hidden, out_channels, 1, 1, 0,
                                        bias=False)
            self.norm = None
            if norm_type == "rms_norm":
                self.norm = RMSNorm(out_channels, eps=1e-5,
                                    elementwise_affine=True, bias=True)

        def forward(self, x):
            if self.residual_connection:
                residual = x
            x = self.conv_inverted(x)
            x = self.nonlinearity(x)
            x = self.conv_depth(x)
            x, gate = torch.chunk(x, 2, dim=1)
            x = x * self.nonlinearity(gate)
            x = self.conv_point(x)
            if self.norm_type == "rms_norm":
                x = self.norm(x.movedim(1, -1)).movedim(-1, 1)
            if self.residual_connection:
                x = x + residual
            return x

    cu = ensure_module("diffusers.configuration_utils", added)
    cu.ConfigMixin = type("ConfigMixin", (), {})
    cu.register_to_config = lambda fn: fn
    ld = ensure_module("diffusers.loaders", added)
    ld.FromOriginalModelMixin = type("FromOriginalModelMixin", (), {})
    au = ensure_module("diffusers.utils.accelerate_utils", added)
    au.apply_forward_hook = lambda fn: fn
    act = ensure_module("diffusers.models.activations", added)
    act.get_activation = get_activation
    ap = ensure_module("diffusers.models.attention_processor", added)
    ap.SanaMultiscaleLinearAttention = type(
        "SanaMultiscaleLinearAttention", (), {})
    mu = ensure_module("diffusers.models.modeling_utils", added)

    class ModelMixin(nn.Module):
        pass

    mu.ModelMixin = ModelMixin
    nm = ensure_module("diffusers.models.normalization", added)
    nm.RMSNorm = RMSNorm
    nm.get_normalization = get_normalization
    st = ensure_module("diffusers.models.transformers.sana_transformer",
                       added)
    st.GLUMBConv = GLUMBConv
    va = ensure_module("diffusers.models.autoencoders.vae", added)
    va.DecoderOutput = types.SimpleNamespace
    va.EncoderOutput = types.SimpleNamespace
    ensure_module("diffusers", added)
    ensure_module("diffusers.utils", added)
    ensure_module("diffusers.models", added)
    ensure_module("diffusers.models.autoencoders", added)
    ensure_module("diffusers.models.transformers", added)


_FLASH_CPU = '''
import torch
import torch.nn as nn
import torch.nn.functional as F

has_flash_attn = True


class FlashAttention(nn.Module):
    """CPU exact-softmax stand-in for the reference CUDA wrapper: same
    (B, S, 3, H, D) packed interface, returns (context (B,S,H,D), None)."""

    def __init__(self, softmax_scale=None, attention_dropout=0.0,
                 device=None, dtype=None):
        super().__init__()
        self.softmax_scale = softmax_scale

    def forward(self, qkv, key_padding_mask=None, causal=False,
                cu_seqlens=None, max_s=None, need_weights=False):
        assert key_padding_mask is None and cu_seqlens is None
        q, k, v = qkv.unbind(2)           # (B, S, H, D)
        q, k, v = (t.transpose(1, 2) for t in (q, k, v))  # (B, H, S, D)
        scale = self.softmax_scale or q.shape[-1] ** -0.5
        o = F.scaled_dot_product_attention(q, k, v, is_causal=causal,
                                           scale=scale)
        return o.transpose(1, 2), None
'''


@pytest.fixture(scope="module")
def ref_dcae(tmp_path_factory):
    torch = pytest.importorskip("torch")
    from ref_stub_util import remove_stubs

    added = []
    _install_diffusers_shim(torch, added)

    pkg_root = str(tmp_path_factory.mktemp("refdcae"))
    d = os.path.join(pkg_root, "refdcae_pkg")
    os.makedirs(d)
    open(os.path.join(d, "__init__.py"), "w").write("")
    shutil.copy(os.path.join(REF, "src", "models", "layers", "rope.py"),
                os.path.join(d, "rope.py"))
    open(os.path.join(d, "flash_attention.py"), "w").write(_FLASH_CPU)
    text = open(DCAE, errors="ignore").read()
    patched = text.replace("from src.models.layers.rope import",
                           "from refdcae_pkg.rope import")
    patched = patched.replace(
        "from src.models.uniflow.flash_attention import",
        "from refdcae_pkg.flash_attention import")
    assert patched != text, "upstream import layout changed; re-check patch"
    open(os.path.join(d, "modeling_dcae.py"), "w").write(patched)

    sys.path.insert(0, pkg_root)
    import refdcae_pkg.modeling_dcae as M

    assert M.has_flash_attn, "CPU flash shim failed to import"
    yield torch, M
    sys.path.remove(pkg_root)
    for k in list(sys.modules):
        if k.startswith("refdcae_pkg"):
            del sys.modules[k]
    remove_stubs(added)


# tiny 3-stage geometry: ResBlock, ResBlock, StandardAttentionBlock stages
BOC = (8, 16, 32)
ENC_LAYERS = (1, 1, 2)
DEC_LAYERS = (1, 2, 1)
BLOCK_TYPES = ("ResBlock", "ResBlock", "EfficientViTBlock")
ATTN_STAGES = (False, False, True)
LATENT = 4
HEAD_DIM = 8


def _randomize(torch, module, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.2)


def _assert_close(ours, ref, label):
    ref = np.asarray(ref)
    tol = 1e-6 * max(1.0, float(np.abs(ref).max()))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=tol, rtol=2e-5,
                               err_msg=label)


def test_dcae_encoder_forward_parity(ref_dcae):
    torch, M = ref_dcae
    import jax.numpy as jnp

    from deco_tpu.convert.dcae_bridge import dcae_encoder_params_from_torch
    from deco_tpu.models.dcae import DCAEEncoder

    tenc = M.Encoder(
        in_channels=3, latent_channels=LATENT, attention_head_dim=HEAD_DIM,
        block_type=BLOCK_TYPES, block_out_channels=BOC,
        layers_per_block=ENC_LAYERS, qkv_multiscales=((), (), ()),
    ).eval()
    _randomize(torch, tenc, 31)

    rs = np.random.RandomState(31)
    x = rs.uniform(-1, 1, (2, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        z_t = tenc(torch.from_numpy(x)).numpy()

    params = dcae_encoder_params_from_torch(
        {k: v.numpy() for k, v in tenc.state_dict().items()})
    jenc = DCAEEncoder(latent_channels=LATENT, block_out_channels=BOC,
                       layers_per_block=ENC_LAYERS,
                       attention_stages=ATTN_STAGES,
                       attention_head_dim=HEAD_DIM)
    z_j = jenc.apply({"params": params},
                     jnp.asarray(x.transpose(0, 2, 3, 1)))
    _assert_close(np.transpose(z_j, (0, 3, 1, 2)), z_t, "encoder latent")


def test_dcae_decoder_forward_parity(ref_dcae):
    """The headless decoder — exactly what the UniFlow DCAE-variant pixel
    branch (modeling_uniflow_dcae.py:1166-1172) and the VAE-GAN
    (encoder_ae_sim.py:173-177) decode through."""
    torch, M = ref_dcae
    import jax.numpy as jnp

    from deco_tpu.convert.dcae_bridge import dcae_decoder_params_from_torch
    from deco_tpu.models.dcae import DCAEDecoder

    tdec = M.Decoder(
        in_channels=3, latent_channels=LATENT, attention_head_dim=HEAD_DIM,
        block_type=BLOCK_TYPES, block_out_channels=BOC,
        layers_per_block=DEC_LAYERS, qkv_multiscales=((), (), ()),
    ).eval()
    _randomize(torch, tdec, 32)

    rs = np.random.RandomState(32)
    z = rs.randn(2, LATENT, 4, 4).astype(np.float32)
    with torch.no_grad():
        y_t = tdec(torch.from_numpy(z)).numpy()

    params = dcae_decoder_params_from_torch(
        {k: v.numpy() for k, v in tdec.state_dict().items()})
    jdec = DCAEDecoder(latent_channels=LATENT, block_out_channels=BOC,
                       layers_per_block=DEC_LAYERS,
                       attention_stages=ATTN_STAGES,
                       attention_head_dim=HEAD_DIM, head=False)
    y_j = jdec.apply({"params": params},
                     jnp.asarray(z.transpose(0, 2, 3, 1)))
    _assert_close(np.transpose(y_j, (0, 3, 1, 2)), y_t, "decoder features")


def test_dclatent_ae_from_torch_state_roundtrip(ref_dcae):
    """Full vendored AutoencoderDC -> DCLatentAE.from_torch_state: stage
    geometry inferred from the weights, encode/decode parity through the
    codec wrapper including the 0.41407 latent scaling."""
    torch, M = ref_dcae
    import jax.numpy as jnp

    from deco_tpu.models.autoencoders import DCLatentAE

    tae = M.AutoencoderDC(
        in_channels=3, latent_channels=LATENT, attention_head_dim=HEAD_DIM,
        encoder_block_types=BLOCK_TYPES, decoder_block_types=BLOCK_TYPES,
        encoder_block_out_channels=BOC, decoder_block_out_channels=BOC,
        encoder_layers_per_block=ENC_LAYERS,
        decoder_layers_per_block=DEC_LAYERS,
        encoder_qkv_multiscales=((), (), ()),
        decoder_qkv_multiscales=((), (), ()),
    ).eval()
    _randomize(torch, tae, 33)

    rs = np.random.RandomState(33)
    x = rs.uniform(-1, 1, (2, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        z_t = tae.encoder(torch.from_numpy(x))
        y_t = tae.decoder(z_t).numpy()

    ae = DCLatentAE.from_torch_state(
        {k: v.numpy() for k, v in tae.state_dict().items()},
        attention_head_dim=HEAD_DIM)
    z_j = ae.encode(jnp.asarray(x.transpose(0, 2, 3, 1)))
    _assert_close(np.transpose(z_j, (0, 3, 1, 2)) / ae.scale, z_t.numpy(),
                  "codec latent (unscaled)")
    y_j = ae.decode(z_j)
    _assert_close(np.transpose(y_j, (0, 3, 1, 2)), y_t, "codec roundtrip")
