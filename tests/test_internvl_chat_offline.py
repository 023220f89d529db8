"""InternVL chat generation driven through the REAL vendored HF stack.

The reference ships complete InternVL model code + tokenizer (weights
excluded) under ``/root/reference/InternVL3-2B``. This fixture shrinks the
config to a tiny random-weight checkpoint, stubs the two GPU-only import
dependencies the vendored code assumes (timm constants/layers, torchvision
Normalize, and its unconditional ``flash_attn`` import + hard-coded
``has_flash_attn=True`` — both upstream CPU-host bugs), and drives
``deco_tpu.models.internvl.InternVLChat`` end-to-end: template assembly,
IMG_CONTEXT token registration, pixel-value splicing, generation, and
separator-based answer extraction (reference
``modeling_internvl_chat.py:310-428`` of hhhhzp/DeCo).
"""

import importlib.machinery
import json
import os
import shutil
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

SRC = "/root/reference/InternVL3-2B"
pytestmark = pytest.mark.skipif(not os.path.isdir(SRC),
                                reason="reference InternVL dir unavailable")


def _mkmod(name):
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    sys.modules[name] = m
    return m


@pytest.fixture(scope="module", autouse=True)
def gpu_dep_stubs():
    """timm/torchvision stubs for the vendored modeling imports (both absent
    in this image; only constants and simple layers are touched)."""
    saved = {k: sys.modules.get(k) for k in
             ("timm", "timm.data", "timm.data.constants", "timm.models",
              "timm.models.layers", "timm.models.registry",
              "timm.models.vision_transformer", "torchvision",
              "torchvision.transforms")}
    _mkmod("timm")
    _mkmod("timm.data")
    c = _mkmod("timm.data.constants")
    c.IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
    c.IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)
    _mkmod("timm.models")
    L = _mkmod("timm.models.layers")

    class DropPath(torch.nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            return x

    L.DropPath = DropPath
    L.trunc_normal_ = torch.nn.init.trunc_normal_
    _mkmod("timm.models.registry").register_model = \
        lambda fn=None, **kw: (fn if fn else (lambda f: f))

    class Block(torch.nn.Module):
        pass

    _mkmod("timm.models.vision_transformer").Block = Block
    _mkmod("torchvision")
    tvt = _mkmod("torchvision.transforms")

    class Normalize:
        def __init__(self, mean, std):
            self.mean = torch.tensor(mean)
            self.std = torch.tensor(std)

        def __call__(self, x):
            return (x - self.mean[:, None, None]) / self.std[:, None, None]

    tvt.Normalize = Normalize
    yield
    for k, v in saved.items():
        if v is None:
            sys.modules.pop(k, None)
        else:
            sys.modules[k] = v


@pytest.fixture(scope="module")
def tiny_internvl_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("tiny_internvl"))
    for f in os.listdir(SRC):
        if not f.endswith((".py", ".json", ".txt")) or f == "config.json":
            continue
        text = open(os.path.join(SRC, f), errors="ignore").read()
        # upstream CPU-host bugs in the vendored modeling_uniflow.py:
        # an unconditional flash_attn import above its own guard (:34) and a
        # hard-coded has_flash_attn=True after the guard (:145)
        text = text.replace(
            "from flash_attn.bert_padding import pad_input, unpad_input"
            "\n\ntry:", "\ntry:", 1)
        text = text.replace(
            "\nhas_flash_attn = True\nlogger = logging.get_logger",
            "\nlogger = logging.get_logger", 1)
        open(os.path.join(d, f), "w").write(text)
    cfg = json.load(open(os.path.join(SRC, "config.json")))
    cfg["vision_config"].update(
        hidden_size=32, intermediate_size=64, num_attention_heads=4,
        num_hidden_layers=2, image_size=28, patch_size=14)
    cfg["llm_config"].update(
        hidden_size=32, intermediate_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2,
        max_position_embeddings=512)
    cfg["force_image_size"] = 28
    json.dump(cfg, open(os.path.join(d, "config.json"), "w"))
    from transformers import AutoConfig, AutoModelForCausalLM

    conf = AutoConfig.from_pretrained(d, trust_remote_code=True)
    torch.manual_seed(0)
    AutoModelForCausalLM.from_config(
        conf, trust_remote_code=True).save_pretrained(d)
    return d


@pytest.fixture(scope="module")
def chat(tiny_internvl_dir):
    from deco_tpu.models.internvl import InternVLChat

    # force_image_size 28 / patch 14 / downsample 0.5 -> 1 image token
    return InternVLChat(weight_path=tiny_internvl_dir, num_image_token=1)


class TestChatRealPath:
    def test_text_only_chat(self, chat):
        ans = chat.chat("What is this?", max_new_tokens=6, do_sample=False)
        assert isinstance(ans, str)

    def test_image_chat_and_history(self, chat):
        px = torch.randn(1, 3, 28, 28)
        ans, hist = chat.chat("Describe the image.", pixel_values=px,
                              return_history=True, max_new_tokens=6,
                              do_sample=False)
        assert isinstance(ans, str)
        assert hist[-1][1] == ans and "<image>" in hist[-1][0]
        # follow-up turn reuses history (no new image tokens)
        ans2 = chat.chat("And then?", history=hist, max_new_tokens=4,
                         do_sample=False)
        assert isinstance(ans2, str)

    def test_query_image_token_layout(self, chat):
        q = chat.build_query("<image>\nWhat?", num_patches_list=[2])
        assert q.count(chat.IMG_CONTEXT) == 2 * chat.num_image_token
        assert chat.IMG_START in q and chat.IMG_END in q
        # text-only: no image tokens
        q2 = chat.build_query("What?", num_patches_list=[])
        assert chat.IMG_CONTEXT not in q2

    def test_deterministic_greedy(self, chat):
        a = chat.chat("Say something.", max_new_tokens=5, do_sample=False)
        b = chat.chat("Say something.", max_new_tokens=5, do_sample=False)
        assert a == b


class TestBatchChat:
    def test_batch_chat_text_only(self, chat):
        answers = chat.batch_chat(["What is this?", "Count to three."],
                                  max_new_tokens=5, do_sample=False)
        assert len(answers) == 2 and all(isinstance(a, str) for a in answers)

    def test_batch_chat_with_images(self, chat):
        px = torch.randn(2, 3, 28, 28)
        answers = chat.batch_chat(["Describe.", "What color?"],
                                  pixel_values=px,
                                  num_patches_list=[1, 1],
                                  max_new_tokens=5, do_sample=False)
        assert len(answers) == 2

    def test_batch_matches_single_greedy(self, chat):
        single = chat.chat("What is this?", max_new_tokens=5, do_sample=False)
        batch = chat.batch_chat(["What is this?"], max_new_tokens=5,
                                do_sample=False)
        assert batch[0] == single
