"""Perceptual tower tests: LPIPS/ConvNeXt behavior + torch converter parity
(random weights — validates every layout mapping without downloads)."""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

warnings.filterwarnings("ignore")

from deco_tpu.models.perceptual import (
    ConvNeXtS,
    LPIPS,
    PerceptualLoss,
    convnext_s_params_from_torch,
    vgg16_params_from_torch,
)


class TestBehavior:
    def test_zero_on_identical(self):
        pl = PerceptualLoss("lpips-convnext_s-1.0-0.1", rng_seed=0)
        a = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3))
        np.testing.assert_allclose(float(pl(a, a).mean()), 0.0, atol=1e-6)

    def test_positive_on_different(self):
        pl = PerceptualLoss("lpips", rng_seed=0)
        a = jax.random.uniform(jax.random.PRNGKey(0), (1, 32, 32, 3))
        b = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 3))
        assert float(pl(a, b).mean()) > 0


class TestTorchParity:
    def test_vgg16_converter_matches_torch(self):
        torch = pytest.importorskip("torch")
        torchvision = pytest.importorskip("torchvision")
        tmodel = torchvision.models.vgg16(weights=None).features.eval()
        sd = {f"features.{k}": v for k, v in tmodel.state_dict().items()}
        # fake LPIPS lin heads
        rng = np.random.RandomState(0)
        for i, c in enumerate((64, 128, 256, 512, 512)):
            sd[f"lin{i}.model.1.weight"] = rng.rand(1, c, 1, 1).astype(np.float32)
        params = vgg16_params_from_torch(sd)

        x = rng.randn(1, 3, 32, 32).astype(np.float32)
        with torch.no_grad():
            # torch taps: features up to relu indices 3, 8, 15, 22, 29
            h = torch.from_numpy(x)
            torch_taps = []
            for idx, layer in enumerate(tmodel):
                h = layer(h)
                if idx in (3, 8, 15, 22, 29):
                    torch_taps.append(h.numpy())
        from deco_tpu.models.perceptual import VGG16Features

        taps = VGG16Features().apply(
            {"params": params["params"]["vgg"]},
            jnp.asarray(x.transpose(0, 2, 3, 1)),
        )
        assert len(taps) == 5
        for jt, tt in zip(taps, torch_taps):
            np.testing.assert_allclose(
                np.asarray(jt).transpose(0, 3, 1, 2), tt, atol=1e-4
            )

    def test_convnext_converter_matches_torch(self):
        torch = pytest.importorskip("torch")
        torchvision = pytest.importorskip("torchvision")
        tmodel = torchvision.models.convnext_small(weights=None).eval()
        sd = tmodel.state_dict()
        params = convnext_s_params_from_torch(sd)
        rng = np.random.RandomState(1)
        x = rng.randn(1, 3, 64, 64).astype(np.float32)
        with torch.no_grad():
            logits_t = tmodel(torch.from_numpy(x)).numpy()
        logits_j = ConvNeXtS().apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(logits_j), logits_t, atol=2e-3)


class TestTorchParityNoTorchvision:
    """VGG16-LPIPS converter parity WITHOUT torchvision (absent in-image).

    torchvision's ``vgg16().features`` is exactly the Sequential implied by
    the VGG16 configuration list (conv3x3/ReLU chains with maxpools), so a
    hand-built plain-torch Sequential reproduces it layer for layer and keys
    line up with the converter's ``features.{i}.*`` expectations.
    """

    def test_vgg16_converter_matches_plain_torch(self):
        torch = pytest.importorskip("torch")
        from deco_tpu.models.perceptual import (VGG16_CFG, VGG16Features,
                                                vgg16_params_from_torch)

        torch.manual_seed(0)
        layers, in_ch = [], 3
        for v in VGG16_CFG:
            if v == "M":
                layers.append(torch.nn.MaxPool2d(2, 2))
            else:
                layers.append(torch.nn.Conv2d(in_ch, v, 3, padding=1))
                layers.append(torch.nn.ReLU(inplace=False))
                in_ch = v
        tmodel = torch.nn.Sequential(*layers).eval()
        sd = {f"features.{k}": v for k, v in tmodel.state_dict().items()}
        rng = np.random.RandomState(0)
        for i, c in enumerate((64, 128, 256, 512, 512)):
            sd[f"lin{i}.model.1.weight"] = rng.rand(1, c, 1, 1).astype(
                np.float32)
        params = vgg16_params_from_torch(sd)

        x = rng.randn(1, 3, 32, 32).astype(np.float32)
        with torch.no_grad():
            h = torch.from_numpy(x)
            torch_taps = []
            for idx, layer in enumerate(tmodel):
                h = layer(h)
                if idx in (3, 8, 15, 22, 29):
                    torch_taps.append(h.numpy())
        taps = VGG16Features().apply(
            {"params": params["params"]["vgg"]},
            jnp.asarray(x.transpose(0, 2, 3, 1)),
        )
        assert len(taps) == len(torch_taps) == 5
        for jt, tt in zip(taps, torch_taps):
            np.testing.assert_allclose(
                np.asarray(jt).transpose(0, 3, 1, 2), tt, atol=1e-4
            )
