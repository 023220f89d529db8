"""FID Inception tower parity WITHOUT torchvision/torch-fidelity: hand-build
the TF-ported FID-variant inception_v3 graph in plain torch (the same
twin-oracle pattern as the VGG16/ConvNeXt tests in test_perceptual.py),
convert its random state dict through ``inception_params_from_torch`` and pin
the Flax tower's 2048-d features. The FID-variant quirks under test — the
``count_include_pad=False`` branch avg pools, the MAX branch pool in
Mixed_7c, the ``(255x-128)/128`` scaling, and the TF1-legacy (non-half-pixel)
bilinear resize — are exactly where a port silently diverges from the tower
torchmetrics' ``FrechetInceptionDistance`` scores with
(reference ``src/callbacks/compute_metrics.py:36``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from deco_tpu.models.inception import (
    InceptionV3Features,
    inception_params_from_torch,
    tf1_bilinear_resize,
)


class BasicConv2d(nn.Module):
    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = nn.BatchNorm2d(cout, eps=0.001)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


def _avg3(x):
    # the FID tower excludes padding from the avg divisor
    return F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)


class BlockA(nn.Module):
    def __init__(self, cin, pool_features):
        super().__init__()
        self.branch1x1 = BasicConv2d(cin, 64, kernel_size=1)
        self.branch5x5_1 = BasicConv2d(cin, 48, kernel_size=1)
        self.branch5x5_2 = BasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = BasicConv2d(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = BasicConv2d(cin, pool_features, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        b3 = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = self.branch_pool(_avg3(x))
        return torch.cat([b1, b5, b3, bp], 1)


class BlockB(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = BasicConv2d(cin, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = BasicConv2d(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3(x)
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = F.max_pool2d(x, 3, stride=2)
        return torch.cat([b3, bd, bp], 1)


class BlockC(nn.Module):
    def __init__(self, cin, c7):
        super().__init__()
        self.branch1x1 = BasicConv2d(cin, 192, kernel_size=1)
        self.branch7x7_1 = BasicConv2d(cin, c7, kernel_size=1)
        self.branch7x7_2 = BasicConv2d(c7, c7, kernel_size=(1, 7),
                                       padding=(0, 3))
        self.branch7x7_3 = BasicConv2d(c7, 192, kernel_size=(7, 1),
                                       padding=(3, 0))
        self.branch7x7dbl_1 = BasicConv2d(cin, c7, kernel_size=1)
        self.branch7x7dbl_2 = BasicConv2d(c7, c7, kernel_size=(7, 1),
                                          padding=(3, 0))
        self.branch7x7dbl_3 = BasicConv2d(c7, c7, kernel_size=(1, 7),
                                          padding=(0, 3))
        self.branch7x7dbl_4 = BasicConv2d(c7, c7, kernel_size=(7, 1),
                                          padding=(3, 0))
        self.branch7x7dbl_5 = BasicConv2d(c7, 192, kernel_size=(1, 7),
                                          padding=(0, 3))
        self.branch_pool = BasicConv2d(cin, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
            self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        bp = self.branch_pool(_avg3(x))
        return torch.cat([b1, b7, bd, bp], 1)


class BlockD(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = BasicConv2d(cin, 192, kernel_size=1)
        self.branch3x3_2 = BasicConv2d(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = BasicConv2d(cin, 192, kernel_size=1)
        self.branch7x7x3_2 = BasicConv2d(192, 192, kernel_size=(1, 7),
                                         padding=(0, 3))
        self.branch7x7x3_3 = BasicConv2d(192, 192, kernel_size=(7, 1),
                                         padding=(3, 0))
        self.branch7x7x3_4 = BasicConv2d(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3_2(self.branch3x3_1(x))
        b7 = self.branch7x7x3_4(self.branch7x7x3_3(self.branch7x7x3_2(
            self.branch7x7x3_1(x))))
        bp = F.max_pool2d(x, 3, stride=2)
        return torch.cat([b3, b7, bp], 1)


class BlockE(nn.Module):
    def __init__(self, cin, max_pool_branch=False):
        super().__init__()
        self.max_pool_branch = max_pool_branch
        self.branch1x1 = BasicConv2d(cin, 320, kernel_size=1)
        self.branch3x3_1 = BasicConv2d(cin, 384, kernel_size=1)
        self.branch3x3_2a = BasicConv2d(384, 384, kernel_size=(1, 3),
                                        padding=(0, 1))
        self.branch3x3_2b = BasicConv2d(384, 384, kernel_size=(3, 1),
                                        padding=(1, 0))
        self.branch3x3dbl_1 = BasicConv2d(cin, 448, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = BasicConv2d(384, 384, kernel_size=(1, 3),
                                           padding=(0, 1))
        self.branch3x3dbl_3b = BasicConv2d(384, 384, kernel_size=(3, 1),
                                           padding=(1, 0))
        self.branch_pool = BasicConv2d(cin, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        if self.max_pool_branch:  # the Mixed_7c TF quirk
            bp = F.max_pool2d(x, 3, stride=1, padding=1)
        else:
            bp = _avg3(x)
        bp = self.branch_pool(bp)
        return torch.cat([b1, b3, bd, bp], 1)


class FIDInceptionTorch(nn.Module):
    """The TF-ported FID inception_v3 pool3 graph, written out longhand."""

    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = BasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = BasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = BasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = BasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = BasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = BlockA(192, 32)
        self.Mixed_5c = BlockA(256, 64)
        self.Mixed_5d = BlockA(288, 64)
        self.Mixed_6a = BlockB(288)
        self.Mixed_6b = BlockC(768, 128)
        self.Mixed_6c = BlockC(768, 160)
        self.Mixed_6d = BlockC(768, 160)
        self.Mixed_6e = BlockC(768, 192)
        self.Mixed_7a = BlockD(768)
        self.Mixed_7b = BlockE(1280)
        self.Mixed_7c = BlockE(2048, max_pool_branch=True)

    def forward(self, x299_01):
        # FID input scaling: uint8-range values mapped by (v - 128) / 128
        x = (x299_01 * 255.0 - 128.0) / 128.0
        x = self.Conv2d_1a_3x3(x)
        x = self.Conv2d_2a_3x3(x)
        x = self.Conv2d_2b_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        x = self.Conv2d_3b_1x1(x)
        x = self.Conv2d_4a_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a",
                     "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e",
                     "Mixed_7a", "Mixed_7b", "Mixed_7c"):
            x = getattr(self, name)(x)
        return x.mean(dim=(2, 3))  # (B, 2048)


def _randomize(model: nn.Module, seed: int = 0):
    """0.2-scale random weights + non-trivial BN running stats (CLAUDE.md
    lesson: tiny scales hide wrong math under tolerance)."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, nn.Conv2d):
                m.weight.copy_(torch.randn(m.weight.shape, generator=g) * 0.2)
            elif isinstance(m, nn.BatchNorm2d):
                m.weight.copy_(1.0 + torch.randn(m.weight.shape,
                                                 generator=g) * 0.2)
                m.bias.copy_(torch.randn(m.bias.shape, generator=g) * 0.2)
                m.running_mean.copy_(torch.randn(m.running_mean.shape,
                                                 generator=g) * 0.2)
                m.running_var.copy_(0.5 + torch.rand(m.running_var.shape,
                                                     generator=g))


class TestFIDInceptionParity:
    def test_tower_matches_plain_torch_twin(self):
        tmodel = FIDInceptionTorch().eval()
        _randomize(tmodel)
        variables = inception_params_from_torch(tmodel.state_dict())

        rng = np.random.RandomState(0)
        # 299x299 input: the TF1 resize is exactly identity there, so the
        # twin (which carries no resize) sees the same pixels
        x = rng.randint(0, 256, (2, 299, 299, 3)).astype(np.float32) / 255.0
        with torch.no_grad():
            ref = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
        got = np.asarray(InceptionV3Features().apply(
            variables, jnp.asarray(x)))
        # deep fp32 conv chain: scale-aware tolerance
        tol = 1e-5 * max(np.abs(ref).max(), 1.0)
        np.testing.assert_allclose(got, ref, atol=tol, rtol=1e-5)

    def test_tf1_resize_matches_longhand_oracle(self):
        """source coord = i*in/out with floor/lerp and edge clamp — written
        out with loops (torch-fidelity reimplements this because torch's
        half-pixel interpolate does NOT match the TF1 FID graph)."""
        rng = np.random.RandomState(1)
        x = rng.rand(1, 7, 11, 2).astype(np.float32)
        oh, ow = 13, 5
        expected = np.empty((1, oh, ow, 2), np.float32)
        for i in range(oh):
            sy = i * x.shape[1] / oh
            y0 = min(int(np.floor(sy)), x.shape[1] - 1)
            y1 = min(y0 + 1, x.shape[1] - 1)
            fy = sy - y0
            for j in range(ow):
                sx = j * x.shape[2] / ow
                x0 = min(int(np.floor(sx)), x.shape[2] - 1)
                x1 = min(x0 + 1, x.shape[2] - 1)
                fx = sx - x0
                top = x[0, y0, x0] * (1 - fx) + x[0, y0, x1] * fx
                bot = x[0, y1, x0] * (1 - fx) + x[0, y1, x1] * fx
                expected[0, i, j] = top * (1 - fy) + bot * fy
        got = np.asarray(tf1_bilinear_resize(jnp.asarray(x), oh, ow))
        np.testing.assert_allclose(got, expected, atol=1e-6)

    def test_tf1_resize_identity_at_same_size(self):
        rng = np.random.RandomState(2)
        x = rng.rand(1, 8, 8, 3).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(tf1_bilinear_resize(jnp.asarray(x), 8, 8)), x,
            atol=1e-7)

    def test_feature_taps_match_torchmetrics_dims(self):
        """FrechetInceptionDistance(feature=...) taps 64/192/768/2048
        (pytorch-fid BLOCK_INDEX_BY_DIM), each globally avg-pooled."""
        import pytest

        rng = np.random.RandomState(4)
        x = jnp.asarray(rng.rand(1, 75, 75, 3).astype(np.float32))
        for dim in (64, 192, 768, 2048):
            model = InceptionV3Features(feature_dim=dim)
            variables = model.init(jax.random.PRNGKey(0), x)
            out = model.apply(variables, x)
            assert out.shape == (1, dim)
        with pytest.raises(ValueError, match="not a FID tap"):
            InceptionV3Features(feature_dim=100).init(jax.random.PRNGKey(0), x)

    def test_hook_honors_fid_feature_dim(self):
        import warnings

        warnings.filterwarnings("ignore")
        from deco_tpu.train.hooks import ComputeMetricsHook

        rng = np.random.RandomState(5)
        a = rng.randint(0, 256, (3, 32, 32, 3)).astype(np.uint8)
        hook = ComputeMetricsHook(compute_fid=True, fid_feature_dim=192)
        hook.on_batch_end(a, a)
        hook.on_batch_end(a, a)
        scores = hook.on_epoch_end()
        assert abs(scores["metrics/fid"]) < 1e-3

    def test_variant_flag_changes_features(self):
        """fid_variant=False (torchvision graph) must NOT equal the FID
        tower on the same weights — the pooling quirks are load-bearing."""
        tmodel = FIDInceptionTorch().eval()
        _randomize(tmodel, seed=3)
        variables = inception_params_from_torch(tmodel.state_dict())
        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.rand(1, 299, 299, 3).astype(np.float32))
        a = np.asarray(InceptionV3Features(fid_variant=True).apply(
            variables, x))
        b = np.asarray(InceptionV3Features(fid_variant=False).apply(
            variables, x))
        assert np.abs(a - b).max() > 1e-3
