"""Native data-plane (C++ threaded JPEG decode + ADM crop) parity tests.

The contract: ``native/libdataplane.so`` must reproduce the PIL pipeline
in :func:`deco_tpu.data.imagenet.adm_center_crop` (reference
``src/data/dataset/imagenet.py:12-32`` of hhhhzp/DeCo — FID-critical) within
1 LSB. Tests build the library on demand when the toolchain is present.
"""

import io
import os
import shutil
import subprocess

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SO = os.path.join(REPO, "native", "libdataplane.so")


def _ensure_built():
    if os.path.exists(SO):
        return True
    if shutil.which("g++") is None:
        return False
    rc = subprocess.run(
        ["bash", os.path.join(REPO, "scripts", "build_native.sh")],
        capture_output=True).returncode
    return rc == 0 and os.path.exists(SO)


pytestmark = pytest.mark.skipif(not _ensure_built(),
                                reason="native toolchain unavailable")


@pytest.fixture(scope="module")
def native():
    from deco_tpu.data import native as mod

    if not mod.available():
        pytest.skip("data-plane failed to load")
    return mod


def _jpeg(h, w, seed=0, quality=92):
    rng = np.random.RandomState(seed)
    base = rng.randint(0, 255, (h // 8 + 1, w // 8 + 1, 3), np.uint8)
    img = np.array(Image.fromarray(base).resize((w, h), Image.BILINEAR))
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


class TestParity:
    @pytest.mark.parametrize("hw", [(512, 768), (300, 300), (1024, 683),
                                    (257, 400), (600, 257)])
    def test_adm_matches_pil(self, native, hw):
        from deco_tpu.data.imagenet import adm_center_crop

        h, w = hw
        jb = _jpeg(h, w)
        ref = np.array(adm_center_crop(
            Image.open(io.BytesIO(jb)).convert("RGB"), 128))
        out = native.decode_jpeg_adm(jb, 128)
        assert out is not None and out.shape == (128, 128, 3)
        assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1

    def test_adm_half_tie_rounding_matches_python(self, native):
        # 182 * (96/128) = 136.5 exactly: Python round() (half-to-even) gives
        # 136 while round-half-away-from-zero gives 137 — a different resize
        # size and crop. The native path must use banker's rounding.
        from deco_tpu.data.imagenet import adm_center_crop

        jb = _jpeg(128, 182, seed=3)
        ref = np.array(adm_center_crop(
            Image.open(io.BytesIO(jb)).convert("RGB"), 96))
        assert ref.shape == (96, 96, 3)
        out = native.decode_jpeg_adm(jb, 96)
        assert out is not None
        assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1

    @pytest.mark.parametrize("filt,pil", [("box", Image.BOX),
                                          ("bicubic", Image.BICUBIC)])
    def test_resize_matches_pil(self, native, filt, pil):
        rng = np.random.RandomState(1)
        img = rng.randint(0, 255, (97, 143, 3), np.uint8)
        ref = np.array(Image.fromarray(img).resize((64, 48), pil))
        out = native.resize(img, 64, 48, filt)
        assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1

    def test_grayscale_jpeg_converts_to_rgb(self, native):
        img = np.random.RandomState(2).randint(0, 255, (300, 400), np.uint8)
        buf = io.BytesIO()
        Image.fromarray(img, mode="L").save(buf, format="JPEG")
        out = native.decode_jpeg_adm(buf.getvalue(), 128)
        assert out is not None and out.shape == (128, 128, 3)
        # R==G==B for grayscale sources
        assert (out[..., 0] == out[..., 1]).all()

    def test_bad_bytes_fail_gracefully(self, native):
        assert native.decode_jpeg_adm(b"not a jpeg", 64) is None


class TestBatch:
    def test_batch_matches_single_and_flags_failures(self, native):
        jpegs = [_jpeg(300, 400, seed=i) for i in range(4)]
        jpegs.insert(2, b"corrupt")
        out, ok = native.decode_jpeg_adm_batch(jpegs, 96, num_threads=2)
        assert out.shape == (5, 96, 96, 3)
        assert ok == [True, True, False, True, True]
        assert (out[2] == 0).all()
        single = native.decode_jpeg_adm(jpegs[0], 96)
        assert (out[0] == single).all()


class TestPixImageNetIntegration:
    def test_dataset_uses_native_path(self, native, tmp_path):
        from deco_tpu.data.imagenet import PixImageNet, adm_center_crop

        root = tmp_path / "data" / "class_a"
        root.mkdir(parents=True)
        jb = _jpeg(300, 400, seed=7)
        (root / "img0.jpeg").write_bytes(jb)
        ds = PixImageNet(str(tmp_path / "data"), resolution=64)
        x, y, meta = ds[0]
        ref = np.array(adm_center_crop(
            Image.open(io.BytesIO(jb)).convert("RGB"), 64))
        got = ((np.asarray(x) + 1.0) / 2.0 * 255.0).round().astype(int)
        assert np.abs(got - ref.astype(int)).max() <= 1

    def test_disable_env_falls_back(self, native, monkeypatch, tmp_path):
        import deco_tpu.data.native as mod

        monkeypatch.setenv("DECO_NATIVE_DECODE", "0")
        monkeypatch.setattr(mod, "_checked", False)
        monkeypatch.setattr(mod, "_lib", None)
        assert not mod.available()
        monkeypatch.setattr(mod, "_checked", False)
