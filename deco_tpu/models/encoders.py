"""REPA target encoders: DINOv2 / CLIP / SigLIP feature extractors.

Parity surface for reference ``src/models/encoder.py:18-230`` (hhhhzp/DeCo).
The reference pulls towers from torch.hub/HF at run time; this zero-egress
environment gates on local weights:

- :class:`DINOv2` — ViT-B/14 patch-token features in Flax (resize h*14/16,
  ImageNet normalization, reference :18-38). With ``weight_path`` pointing at
  a converted checkpoint the features match the published tower; without, the
  tower is randomly initialized (warned) — REPA still regularizes against a
  fixed random feature space, and the idiomatic TPU path is precomputing
  features into ``metadata['repa_features']`` anyway.
- :class:`CLIP` / :class:`SigLIP` / :class:`SigLIPVision` — HF-gated host-side
  wrappers (torch CPU) exposing the same callable surface.

All callables map NHWC [0,1] images -> (B, N, D) features.
"""

from __future__ import annotations

import warnings
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class DINOv2:
    """ViT-B/14 patch-token encoder (jax callable)."""

    def __init__(self, weight_path: Optional[str] = None,
                 base_patch_size: int = 16, hidden_size: int = 768,
                 num_layers: int = 12, num_heads: int = 12, rng_seed: int = 0,
                 image_size: int = 518):
        from deco_tpu.models.uniflow.vit import ViTConfig, VisionModel

        self.base_patch_size = base_patch_size
        self.cfg = ViTConfig(
            hidden_size=hidden_size, num_layers=num_layers, num_heads=num_heads,
            intermediate_size=hidden_size * 4, patch_size=14,
            image_size=image_size,
            qkv_bias=True, qk_normalization=False, norm_type="layer_norm",
            initializer_factor=1.0,
        )
        self.model = VisionModel(self.cfg, dtype=jnp.float32)
        if weight_path:
            import numpy as _np

            data = _np.load(weight_path, allow_pickle=True)
            self.params = jax.tree.map(jnp.asarray, data["params"].item())
        else:
            warnings.warn(
                "DINOv2 running with random weights (no torch.hub in this "
                "environment); convert the published tower or precompute "
                "metadata['repa_features'] for faithful REPA training."
            )
            self.params = self.model.init(
                jax.random.PRNGKey(rng_seed), jnp.zeros((1, 224, 224, 3))
            )

    def __call__(self, x, resize: bool = True):
        """x: (B, H, W, 3) in [0, 1] -> (B, N, D) patch tokens.

        Matches the reference's ``forward_features(x)['x_norm_patchtokens']``
        (encoder_custom.py:44): the FINAL LayerNorm applies before patch
        tokens are taken — converted checkpoints carry it as
        ``params['final_norm']`` (dinov2_params_from_torch); random-weight
        fallbacks run identity (no norm params)."""
        x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
        if resize:
            b, h, w, c = x.shape
            th = int(14 * h / self.base_patch_size)
            tw = int(14 * w / self.base_patch_size)
            x = jax.image.resize(x, (b, th, tw, c), "cubic")
        hidden, _ = self.model.apply(
            {"params": self.params["params"]} if "params" in self.params
            else self.params, x)
        fn = self.params.get("final_norm") if hasattr(self.params, "get") \
            else None
        if fn is not None:
            hf = hidden.astype(jnp.float32)
            mu = hf.mean(-1, keepdims=True)
            var = ((hf - mu) ** 2).mean(-1, keepdims=True)
            hidden = ((hf - mu) / jnp.sqrt(var + 1e-6)
                      * jnp.asarray(fn["scale"]) + jnp.asarray(fn["bias"])
                      ).astype(hidden.dtype)
        return hidden[:, 1:]  # patch tokens (drop cls)


class _HFGated:
    def __init__(self, weight_path: str, cls_name: str):
        self.weight_path = weight_path
        self._loaded = None
        self._cls_name = cls_name

    def _require(self):
        if self._loaded is None:
            raise RuntimeError(
                f"{self._cls_name} needs local HF weights at "
                f"{self.weight_path!r}; not available in this environment"
            )
        return self._loaded


class CLIP(_HFGated):
    """CLIP image-text score maps (reference encoder.py:41-64)."""

    def __init__(self, weight_path: str):
        super().__init__(weight_path, "CLIP")
        try:
            import torch
            from transformers import CLIPModel, CLIPTokenizer

            self._loaded = (
                CLIPModel.from_pretrained(weight_path).eval(),
                CLIPTokenizer.from_pretrained(weight_path),
            )
        except Exception:
            pass

    def __call__(self, x, text, resize: bool = True):
        import torch

        model, tokenizer = self._require()
        xt = torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2)
        tokens = tokenizer(text, truncation=True, return_tensors="pt",
                           padding="max_length",
                           max_length=tokenizer.model_max_length).input_ids
        with torch.no_grad():
            t_out = model.text_model(input_ids=tokens).last_hidden_state
            t_out = torch.nn.functional.normalize(
                model.text_projection(t_out), dim=-1
            )
            size = model.config.vision_config.image_size
            if resize:
                xt = torch.nn.functional.interpolate(xt, (size, size),
                                                     mode="bicubic")
            mean = torch.tensor([0.48145466, 0.4578275, 0.40821073])
            std = torch.tensor([0.26862954, 0.26130258, 0.27577711])
            xt = (xt - mean[:, None, None]) / std[:, None, None]
            v_out = model.vision_model(xt).last_hidden_state[:, 1:]
            v_out = torch.nn.functional.normalize(
                model.visual_projection(v_out), dim=-1
            )
            return jnp.asarray(torch.bmm(v_out, t_out.transpose(1, 2)).numpy())


class SigLIP(_HFGated):
    def __init__(self, weight_path: str):
        super().__init__(weight_path, "SigLIP")
        try:
            from transformers import SiglipModel, SiglipTokenizer

            self._loaded = (
                SiglipModel.from_pretrained(weight_path).eval(),
                SiglipTokenizer.from_pretrained(weight_path),
            )
        except Exception:
            pass


class SigLIPVision(_HFGated):
    def __init__(self, weight_path: str, base_patch_size: int = 16):
        super().__init__(weight_path, "SigLIPVision")
        self.base_patch_size = base_patch_size
        try:
            from transformers import SiglipVisionModel

            self._loaded = SiglipVisionModel.from_pretrained(weight_path).eval()
        except Exception:
            pass

    def __call__(self, x, resize: bool = True):
        import torch

        model = self._require()
        xt = torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2)
        with torch.no_grad():
            if resize:
                size = model.config.image_size
                xt = torch.nn.functional.interpolate(xt, (size, size),
                                                     mode="bicubic")
            xt = (xt - 0.5) / 0.5
            return jnp.asarray(model(xt).last_hidden_state.numpy())
