"""REPA-target encoder wrappers driven through their REAL HF code paths.

Like tests/test_qwen3_offline.py: the CLIP / SigLIP wrappers in
:mod:`deco_tpu.models.encoders` run host-side HF torch models (reference
``src/models/encoder.py:41-110`` of hhhhzp/DeCo). Pretrained weights are
env-gated, but the architecture code ships with transformers — so tiny
RANDOM-weight checkpoints synthesized on disk exercise tokenization,
normalization constants, projection/normalize pipelines, and output layout
end-to-end. Only the published weights remain gated.
"""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def tiny_clip_dir(tmp_path_factory):
    from transformers import (CLIPConfig, CLIPModel, CLIPTextConfig,
                              CLIPTokenizer, CLIPVisionConfig)

    d = str(tmp_path_factory.mktemp("clip"))
    vocab = {t: i for i, t in enumerate(
        ["<|startoftext|>", "<|endoftext|>"]
        + list("abcdefghijklmnopqrstuvwxyz")
        + [c + "</w>" for c in "abcdefghijklmnopqrstuvwxyz"]
        + ["ca", "cat</w>", "do", "dog</w>"])}
    with open(os.path.join(d, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(d, "merges.txt"), "w") as f:
        f.write("#version: 0.2\nc a\nca t</w>\nd o\ndo g</w>\n")
    tok = CLIPTokenizer(os.path.join(d, "vocab.json"),
                        os.path.join(d, "merges.txt"))
    tok.model_max_length = 16
    tok.save_pretrained(d)
    cfg = CLIPConfig(
        text_config=CLIPTextConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, vocab_size=len(vocab),
            max_position_embeddings=16, projection_dim=24).to_dict(),
        vision_config=CLIPVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, image_size=32, patch_size=8,
            projection_dim=24).to_dict(),
        projection_dim=24)
    torch.manual_seed(0)
    CLIPModel(cfg).save_pretrained(d)
    return d


@pytest.fixture(scope="module")
def tiny_siglip_dir(tmp_path_factory):
    from transformers import SiglipVisionConfig, SiglipVisionModel

    d = str(tmp_path_factory.mktemp("siglip"))
    torch.manual_seed(0)
    SiglipVisionModel(SiglipVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=32, patch_size=8)).save_pretrained(d)
    return d


class TestCLIPRealPath:
    def test_score_maps(self, tiny_clip_dir):
        from deco_tpu.models.encoders import CLIP

        clip = CLIP(tiny_clip_dir)
        x = np.random.RandomState(0).rand(2, 32, 32, 3).astype(np.float32)
        out = clip(x, ["a cat", "dog"])
        # (B, patches, text_tokens) similarity maps of normalized projections
        assert out.shape == (2, 16, 16)
        assert np.isfinite(np.asarray(out)).all()
        assert np.abs(np.asarray(out)).max() <= 1.0 + 1e-5

    def test_resize_path(self, tiny_clip_dir):
        from deco_tpu.models.encoders import CLIP

        clip = CLIP(tiny_clip_dir)
        x = np.random.RandomState(1).rand(1, 64, 64, 3).astype(np.float32)
        out = clip(x, ["cat"], resize=True)  # 64 -> model's 32
        assert out.shape == (1, 16, 16)

    def test_missing_weights_raise_helpfully(self, tmp_path):
        from deco_tpu.models.encoders import CLIP

        clip = CLIP(str(tmp_path / "nope"))
        with pytest.raises(RuntimeError, match="local HF weights"):
            clip(np.zeros((1, 32, 32, 3), np.float32), ["x"])


class TestSigLIPVisionRealPath:
    def test_patch_tokens(self, tiny_siglip_dir):
        from deco_tpu.models.encoders import SigLIPVision

        sv = SigLIPVision(tiny_siglip_dir, base_patch_size=16)
        x = np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32)
        out = sv(x)
        assert out.shape == (2, 16, 32)  # (B, patches, hidden)
        assert np.isfinite(np.asarray(out)).all()

    def test_deterministic(self, tiny_siglip_dir):
        from deco_tpu.models.encoders import SigLIPVision

        sv = SigLIPVision(tiny_siglip_dir)
        x = np.random.RandomState(2).rand(1, 32, 32, 3).astype(np.float32)
        np.testing.assert_array_equal(np.asarray(sv(x)), np.asarray(sv(x)))
