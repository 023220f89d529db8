"""DINOv2 converter + forward parity vs a hand-built torch DINOv2.

torch.hub is unreachable (zero-egress) and timm is absent, but DINOv2
ViT-B/14 is a standard pre-norm ViT with LayerScale and exact GELU — built
here in plain torch with the hub checkpoint's exact state-dict layout
(``patch_embed.proj``, ``cls_token``, ``pos_embed``, ``blocks.{i}.*``,
``ls{1,2}.gamma``, final ``norm``). The converter
(:func:`deco_tpu.convert.vit_bridge.dinov2_params_from_torch`) must make
:class:`deco_tpu.models.encoders.DINOv2` reproduce its
``x_norm_patchtokens`` output (reference ``encoder_custom.py:18-46``).
"""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")

HID, HEADS, LAYERS, PATCH, IMG = 32, 4, 2, 14, 28


class _TorchBlock(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.norm1 = torch.nn.LayerNorm(HID, eps=1e-6)
        self.attn = torch.nn.Module()
        self.attn.qkv = torch.nn.Linear(HID, HID * 3)
        self.attn.proj = torch.nn.Linear(HID, HID)
        self.ls1 = torch.nn.Module()
        self.ls1.gamma = torch.nn.Parameter(torch.rand(HID))
        self.norm2 = torch.nn.LayerNorm(HID, eps=1e-6)
        self.mlp = torch.nn.Module()
        self.mlp.fc1 = torch.nn.Linear(HID, HID * 4)
        self.mlp.fc2 = torch.nn.Linear(HID * 4, HID)
        self.ls2 = torch.nn.Module()
        self.ls2.gamma = torch.nn.Parameter(torch.rand(HID))

    def forward(self, x):
        b, n, c = x.shape
        h = self.norm1(x)
        qkv = self.attn.qkv(h).reshape(b, n, 3, HEADS, c // HEADS)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q = q.transpose(1, 2)
        k = k.transpose(1, 2)
        v = v.transpose(1, 2)
        a = torch.softmax(q @ k.transpose(-2, -1) / math.sqrt(c // HEADS), -1)
        h = (a @ v).transpose(1, 2).reshape(b, n, c)
        x = x + self.ls1.gamma * self.attn.proj(h)
        h = self.mlp.fc2(torch.nn.functional.gelu(self.mlp.fc1(self.norm2(x))))
        return x + self.ls2.gamma * h


class _TorchDinov2(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.patch_embed = torch.nn.Module()
        self.patch_embed.proj = torch.nn.Conv2d(3, HID, PATCH, PATCH)
        self.cls_token = torch.nn.Parameter(torch.randn(1, 1, HID) * 0.02)
        n = (IMG // PATCH) ** 2
        self.pos_embed = torch.nn.Parameter(torch.randn(1, n + 1, HID) * 0.02)
        self.blocks = torch.nn.ModuleList([_TorchBlock() for _ in range(LAYERS)])
        self.norm = torch.nn.LayerNorm(HID, eps=1e-6)

    def forward_features(self, x):
        b = x.shape[0]
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(b, -1, -1), x], dim=1)
        x = x + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        x = self.norm(x)
        return {"x_norm_patchtokens": x[:, 1:]}


@pytest.fixture(scope="module")
def towers():
    torch.manual_seed(0)
    tmodel = _TorchDinov2().eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    from deco_tpu.convert.vit_bridge import dinov2_params_from_torch
    from deco_tpu.models.encoders import DINOv2

    params = dinov2_params_from_torch(sd, num_layers=LAYERS)
    enc = DINOv2(weight_path=None, base_patch_size=14, hidden_size=HID,
                 num_layers=LAYERS, num_heads=HEADS, image_size=IMG)
    enc.params = params
    import jax.tree_util  # ensure plain-dict params are fine

    return tmodel, enc


class TestDinov2Parity:
    def test_forward_matches_torch_hub_layout(self, towers):
        import jax.numpy as jnp

        tmodel, enc = towers
        rng = np.random.RandomState(0)
        x01 = rng.rand(2, IMG, IMG, 3).astype(np.float32)
        # reference normalization (encoder_custom.py:41)
        mean = np.array([0.485, 0.456, 0.406], np.float32)
        std = np.array([0.229, 0.224, 0.225], np.float32)
        xt = torch.from_numpy(
            ((x01 - mean) / std).transpose(0, 3, 1, 2).copy())
        with torch.no_grad():
            ref = tmodel.forward_features(xt)["x_norm_patchtokens"].numpy()
        # fp32 apply for tight comparison
        enc.model = type(enc.model)(enc.model.cfg, dtype=jnp.float32)
        out = np.asarray(enc(jnp.asarray(x01), resize=False))
        assert out.shape == ref.shape == (2, (IMG // PATCH) ** 2, HID)
        np.testing.assert_allclose(out, ref, atol=2e-4)

    def test_final_norm_is_applied(self, towers):
        import jax.numpy as jnp

        _, enc = towers
        x = np.random.RandomState(1).rand(1, IMG, IMG, 3).astype(np.float32)
        with_norm = np.asarray(enc(jnp.asarray(x), resize=False))
        fn = enc.params.pop("final_norm")
        try:
            without = np.asarray(enc(jnp.asarray(x), resize=False))
        finally:
            enc.params["final_norm"] = fn
        assert not np.allclose(with_norm, without)
