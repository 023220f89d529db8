"""Guidance-function parity vs the reference (pure functions, exact).

simple/rescale/c3 guidance combinations compared element-wise against
src/diffusion/base/guidance.py on random CFG-doubled batches. The c3
variant operates on channels: NCHW upstream, NHWC here."""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not available"
)


@pytest.fixture(scope="module")
def ref_guidance():
    pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from src.diffusion.base import guidance

    return guidance


def _rand(shape, seed):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


def test_simple_guidance_parity(ref_guidance):
    import torch

    from deco_tpu.diffusion.guidance import simple_guidance_fn

    out = _rand((4, 5, 6, 6), 0)
    t = ref_guidance.simple_guidance_fn(torch.from_numpy(out), 3.2).numpy()
    j = simple_guidance_fn(out, 3.2)
    np.testing.assert_allclose(np.asarray(j), t, atol=1e-6)


def test_rescale_guidance_parity(ref_guidance):
    import torch

    from deco_tpu.diffusion.guidance import guidance_fn_with_rescale

    out = _rand((4, 5, 6, 6), 1)  # NCHW for the reference
    t = ref_guidance.guidance_fn_with_rescale(
        torch.from_numpy(out), 4.0, rescale_factor=0.7).numpy()
    # ours reduces over all non-batch axes — layout-agnostic; feed NCHW too
    j = guidance_fn_with_rescale(out, 4.0, rescale_factor=0.7)
    np.testing.assert_allclose(np.asarray(j), t, atol=1e-5, rtol=1e-5)


def test_c3_guidance_parity(ref_guidance):
    import torch

    from deco_tpu.diffusion.guidance import c3_guidance_fn

    out = _rand((4, 5, 6, 6), 2)  # 5 channels: first 3 guided
    t = ref_guidance.c3_guidance_fn(torch.from_numpy(out.copy()), 2.5).numpy()
    j = c3_guidance_fn(out.transpose(0, 2, 3, 1), 2.5)
    np.testing.assert_allclose(
        np.asarray(j).transpose(0, 3, 1, 2), t, atol=1e-6)
