"""UniFlow unified understanding+generation model (Flax).

Parity with reference ``UniFlowVisionModel``
(``src/models/uniflow/modeling_uniflow.py:1227-1677`` of hhhhzp/DeCo, config
``src/models/uniflow/config.json``): shared InternViT-style encoder (24L
h1024 p14) + 4-layer shallow encoder; condition-gated LatentProjector to a
layer-normed 256-d latent grid; a causal semantic branch reconstructing
(teacher-normed) ViT tokens through a FlowDecoder + mlp1 distillation; and a
pixel branch (token upsample x2 -> 6 DiT blocks with sincos+RoPE positions ->
per-patch FlowDecoder) with optional LPIPS.

The LPIPS tower is injected as ``lpips_fn`` (a frozen jax callable) — frozen
perceptual towers live outside the trainable module in deco_tpu.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from deco_tpu.models import layers as L
from deco_tpu.models.uniflow import components as C
from deco_tpu.models.uniflow.flow_decoder import FlowDecoder
from deco_tpu.models.uniflow.vit import ViTConfig, VisionModel

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


@dataclasses.dataclass(frozen=True)
class UniFlowConfig:
    """UniFlowVisionConfig surface (reference configuration_uniflow.py:11-107).

    Accepts every knob of the reference HF config class so the shipped
    ``src/models/uniflow/config.json`` loads unmodified via
    :meth:`from_pretrained` — including the reference's string-typed
    ``num_sampling_steps`` (coerced like ``modeling_uniflow.py:729``) and the
    config-accepted-but-model-unused ``compression_layers`` /
    ``num_query_per_layer`` pair (stored for round-trip parity; the reference
    model never reads them — grep over ``modeling_uniflow.py`` finds no use).
    """

    vit_hidden_size: int = 1024
    llm_hidden_size: int = 1536
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    intermediate_size: int = 4096
    patch_size: int = 14
    image_size: int = 448
    latent_ch: int = 32
    global_blocks_depth: int = 6
    num_decoder_layers: int = 12
    num_sampling_steps: int = 4
    qkv_bias: bool = True
    qk_normalization: bool = False
    norm_type: str = "layer_norm"
    enable_semantic_branch: bool = True
    enable_pixel_branch: bool = True
    # --- reference knobs accepted for config parity ---
    num_channels: int = 3
    hidden_act: str = "gelu"
    layer_norm_eps: float = 1e-6
    dropout: float = 0.0
    drop_path_rate: float = 0.0
    attention_dropout: float = 0.0
    initializer_range: float = 0.02
    initializer_factor: float = 0.1
    use_flash_attn: bool = True
    use_global_blocks: bool = True
    use_cfg: bool = False
    use_disp_loss: bool = False
    use_chal_proj: bool = True
    decoder_type: str = "mlp"
    compression_layers: tuple = (-1, 4)
    num_query_per_layer: tuple = (64, 191)
    # --- DCAE-variant pixel branch (decoder_type="dcae") ---
    # Reference UniFlowVisionModel_DCAE hard-codes the Sana-600M DC-AE decoder
    # geometry (modeling_uniflow_dcae.py:1168-1172); these fields expose it so
    # tiny test configs are possible. The per-pixel flow head is width 64 /
    # depth 6 upstream (:1174-1186).
    dcae_block_out_channels: tuple = (128, 256, 512, 512, 1024, 1024)
    dcae_layers_per_block: tuple = (3, 3, 3, 3, 3, 3)
    dcae_attention_stages: tuple = (False, False, False, True, True, True)
    dcae_flow_width: int = 64
    dcae_flow_depth: int = 6

    def __post_init__(self):
        # reference ships num_sampling_steps as a string ("4"); coerce like
        # modeling_uniflow.py:729 (int(num_sampling_steps))
        object.__setattr__(self, "num_sampling_steps",
                           int(self.num_sampling_steps))
        for k in ("compression_layers", "num_query_per_layer",
                  "dcae_block_out_channels", "dcae_layers_per_block",
                  "dcae_attention_stages"):
            object.__setattr__(self, k, tuple(getattr(self, k)))

    @classmethod
    def from_dict(cls, d: dict) -> "UniFlowConfig":
        """Build from a reference config dict, tolerating unknown keys.

        Mirrors ``UniFlowVisionConfig.from_pretrained`` semantics
        (configuration_uniflow.py:86-107): a ``vision_config`` sub-dict is
        unwrapped; HF bookkeeping keys are ignored. The reference config.json
        carries both ``hidden_size`` (the ViT width) and ``vit_hidden_size``
        (the projector input width) — equal for InternViT-2B; ``hidden_size``
        wins for the encoder when they ever differ is NOT replicated because
        deco_tpu's encoder reads vit_hidden_size (they are tied upstream too:
        modeling_uniflow.py builds the ViT from the same config).
        """
        if "vision_config" in d:
            d = d["vision_config"]
        d = dict(d)
        if "hidden_size" in d and "vit_hidden_size" not in d:
            d["vit_hidden_size"] = d["hidden_size"]
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})

    @classmethod
    def from_pretrained(cls, path: str) -> "UniFlowConfig":
        """Load from a config.json file or an HF model directory."""
        import json
        import os

        if os.path.isdir(path):
            path = os.path.join(path, "config.json")
        with open(path) as f:
            return cls.from_dict(json.load(f))

    def to_dict(self) -> dict:
        d = dataclasses.asdict(self)
        d["compression_layers"] = list(d["compression_layers"])
        d["num_query_per_layer"] = list(d["num_query_per_layer"])
        return d

    def vit(self, num_layers=None) -> ViTConfig:
        return ViTConfig(
            hidden_size=self.vit_hidden_size,
            num_layers=num_layers or self.num_hidden_layers,
            num_heads=self.num_attention_heads,
            intermediate_size=self.intermediate_size,
            patch_size=self.patch_size,
            image_size=self.image_size,
            qkv_bias=self.qkv_bias,
            qk_normalization=self.qk_normalization,
            norm_type=self.norm_type,
        )


class UniFlowVision(nn.Module):
    cfg: UniFlowConfig = UniFlowConfig()
    dtype: Any = jnp.bfloat16

    def setup(self):
        cfg = self.cfg
        vh = cfg.vit_hidden_size
        self.embeddings_encoder = VisionModel(
            cfg.vit(), dtype=self.dtype, name="vision"
        )
        self.shallow = VisionModel(
            cfg.vit(num_layers=4), dtype=self.dtype, name="shallow"
        )
        # mlp1: LayerNorm(4*vh) -> Linear(llm) -> GELU -> Linear(llm)
        self.mlp1_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                      name="mlp1_norm")
        self.mlp1_fc1 = nn.Dense(cfg.llm_hidden_size, dtype=self.dtype,
                                 name="mlp1_fc1")
        self.mlp1_fc2 = nn.Dense(cfg.llm_hidden_size, dtype=self.dtype,
                                 name="mlp1_fc2")
        self.shared_latent_proj = C.LatentProjector(
            out_channels=256, num_res_blocks=3, dtype=self.dtype,
            name="shared_latent_proj",
        )
        grid = cfg.image_size // cfg.patch_size

        if cfg.enable_pixel_branch and cfg.decoder_type == "dcae":
            # DCAE-variant pixel branch (UniFlowVisionModel_DCAE,
            # modeling_uniflow_dcae.py:1127-1186): gen_proj -> 32ch latent
            # grid -> headless DC-AE decoder features -> bilinear resize onto
            # the pixel grid -> per-pixel flow head (patch_size=1).
            from deco_tpu.models.dcae import DCAEDecoder

            self.gen_proj_fc1 = nn.Dense(4 * vh, dtype=self.dtype,
                                         name="gen_latent_proj_fc1")
            self.gen_proj_fc2 = nn.Dense(cfg.latent_ch, dtype=self.dtype,
                                         name="gen_latent_proj_fc2")
            self.dcae_decoder = DCAEDecoder(
                latent_channels=cfg.latent_ch,
                block_out_channels=cfg.dcae_block_out_channels,
                layers_per_block=cfg.dcae_layers_per_block,
                attention_stages=cfg.dcae_attention_stages,
                head=False, dtype=self.dtype, name="dcae_decoder",
            )
            self.flow_head = FlowDecoder(
                target_channels=3,
                z_channels=cfg.dcae_block_out_channels[0],
                width=cfg.dcae_flow_width, depth=cfg.dcae_flow_depth,
                num_sampling_steps=cfg.num_sampling_steps,
                patch_size=1, max_freqs=32, dtype=self.dtype,
                name="flow_head",
            )
        elif cfg.enable_pixel_branch:
            self.gen_proj_fc1 = nn.Dense(4 * vh, dtype=self.dtype,
                                         name="gen_latent_proj_fc1")
            self.gen_proj_fc2 = nn.Dense(vh, dtype=self.dtype,
                                         name="gen_latent_proj_fc2")
            sincos = C.get_2d_sincos_pos_embed(vh, grid)
            self.global_block_pos_embed = self.param(
                "global_block_pos_embed",
                lambda rng: jnp.asarray(sincos)[None],
            )
            self.global_blocks = [
                C.PlainDiTBlock(num_heads=16, mlp_ratio=4.0, dtype=self.dtype,
                                name=f"global_blocks_{i}")
                for i in range(cfg.global_blocks_depth)
            ]
            self.flow_head = FlowDecoder(
                target_channels=3 * cfg.patch_size**2,
                z_channels=vh, width=vh, depth=cfg.num_decoder_layers,
                num_sampling_steps=cfg.num_sampling_steps,
                patch_size=cfg.patch_size, max_freqs=32, dtype=self.dtype,
                name="flow_head",
            )

        if cfg.enable_semantic_branch:
            self.sem_proj_fc1 = nn.Dense(4 * vh, dtype=self.dtype,
                                         name="sem_latent_proj_fc1")
            self.sem_proj_fc2 = nn.Dense(2 * vh, dtype=self.dtype,
                                         name="sem_latent_proj_fc2")
            sem_sincos = C.get_2d_sincos_pos_embed(2 * vh, grid // 2)
            self.sem_global_block_pos_embed = self.param(
                "sem_global_block_pos_embed",
                lambda rng: jnp.asarray(sem_sincos)[None],
            )
            self.sem_global_blocks = [
                C.PlainDiTBlock(num_heads=32, mlp_ratio=4.0, is_causal=True,
                                dtype=self.dtype, name=f"sem_global_blocks_{i}")
                for i in range(cfg.global_blocks_depth)
            ]
            self.sem_flow_head = FlowDecoder(
                target_channels=vh * 4, z_channels=2 * vh, width=2048, depth=4,
                num_sampling_steps=cfg.num_sampling_steps, patch_size=1,
                max_freqs=32, dtype=self.dtype, name="sem_flow_head",
            )

    # ---- pieces ----

    def mlp1(self, x):
        return self.mlp1_fc2(nn.gelu(self.mlp1_fc1(self.mlp1_norm(x)), approximate=False))

    def _normalize(self, pixel_values, normalize_type="siglip"):
        if normalize_type == "siglip":
            x = pixel_values * 0.5 + 0.5
            x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
            return x
        return pixel_values

    def forward_encoder(self, pixel_values, normalize_type="siglip"):
        """Returns (sem_tokens_downsampled, sem_tokens_after_mlp, latent)."""
        x = self._normalize(pixel_values, normalize_type)
        shallow_hidden, _ = self.shallow(x)
        shallow_hidden = shallow_hidden[:, 1:]
        hidden, _ = self.embeddings_encoder(x)
        sem_tokens = hidden[:, 1:]
        latent = self.shared_latent_proj(sem_tokens, shallow_hidden)
        latent = _param_free_layer_norm(latent, eps=1e-5)
        sem_down = C.resample_tokens(sem_tokens, 0.5)
        sem_after_mlp = self.mlp1(sem_down)
        return sem_down, sem_after_mlp, latent

    def _run_pixel_trunk_dcae(self, latent, out_hw):
        """DCAE-variant conditioning (modeling_uniflow_dcae.py:1384-1425):
        latent tokens -> gen_proj -> layer_norm -> spatial 32ch grid ->
        headless DC-AE decoder -> bilinear resize onto the (H, W) pixel grid
        -> (B, H*W, C_feat) per-pixel condition tokens."""
        cond = self.gen_proj_fc2(nn.gelu(self.gen_proj_fc1(latent), approximate=False))
        cond = _param_free_layer_norm(cond, eps=1e-5)
        b, n, c = cond.shape
        grid = int(round(np.sqrt(n)))
        z = cond.reshape(b, grid, grid, c)
        feats = self.dcae_decoder(z)
        h, w = out_hw
        feats = jax.image.resize(
            feats.astype(jnp.float32), (b, h, w, feats.shape[-1]), "bilinear"
        ).astype(feats.dtype)
        return feats.reshape(b, h * w, feats.shape[-1])

    def _run_pixel_trunk(self, latent):
        up = C.resample_tokens(latent, 2.0)
        cond = self.gen_proj_fc2(nn.gelu(self.gen_proj_fc1(up), approximate=False))
        b, n, c = cond.shape
        grid = int(round(np.sqrt(n)))
        pos_embed = _interp_pos(self.global_block_pos_embed, grid)
        cond = cond + pos_embed.astype(cond.dtype)
        # reference hard-codes head_dim=64 (fetch_pos, :1406); equal to c/16.
        # fetch_pos builds the ex2d table (modeling_uniflow.py imports
        # precompute_freqs_cis_ex2d as precompute_freqs_cis_2d, scale=1.0):
        # positions span [0, grid], NOT the DeCo family's [0, 16].
        rope = L.precompute_rope_2d(c // 16, grid, grid, scale=1.0,
                                    extrapolate=True)
        for block in self.global_blocks:
            cond = block(cond, rope)
        return cond, rope

    def _run_semantic_trunk(self, latent):
        cond = self.sem_proj_fc2(nn.gelu(self.sem_proj_fc1(latent), approximate=False))
        b, n, c = cond.shape
        grid = int(round(np.sqrt(n)))
        pos_embed = _interp_pos(self.sem_global_block_pos_embed, grid)
        cond = cond + pos_embed.astype(cond.dtype)
        # ex2d table, like the pixel trunk (see _run_pixel_trunk note)
        rope = L.precompute_rope_2d(c // 32, grid, grid, scale=1.0,
                                    extrapolate=True)
        for block in self.sem_global_blocks:
            cond = block(cond, rope)
        return cond, rope

    # ---- training ----

    def forward_loss(self, pixel_values, rng, teacher_feat=None,
                     lpips_fn: Optional[Callable] = None):
        cfg = self.cfg
        sem_down, sem_after_mlp, latent = self.forward_encoder(pixel_values)
        losses = {}
        total = 0.0
        rng_sem, rng_pix = jax.random.split(rng)

        if cfg.enable_semantic_branch:
            if teacher_feat is not None:
                target = _param_free_layer_norm(teacher_feat["vit_embeds"])
            else:
                target = _param_free_layer_norm(sem_down)
            cond, _ = self._run_semantic_trunk(latent)
            sem_out = self.sem_flow_head.forward_train(
                target.astype(jnp.float32), cond, rng_sem
            )
            pred_after_mlp = self.mlp1(sem_out["pred"].astype(self.dtype))
            if teacher_feat is not None:
                distill = jnp.mean(
                    (pred_after_mlp.astype(jnp.float32)
                     - teacher_feat["vit_embeds_mlp"].astype(jnp.float32)) ** 2
                )
                vit_distill = jnp.mean(
                    (sem_down.astype(jnp.float32)
                     - teacher_feat["vit_embeds"].astype(jnp.float32)) ** 2
                )
            else:
                distill = jnp.mean(
                    (pred_after_mlp.astype(jnp.float32)
                     - sem_after_mlp.astype(jnp.float32)) ** 2
                )
                vit_distill = jnp.float32(0.0)
            losses["distill_loss"] = distill
            losses["vit_distill_loss"] = vit_distill
            losses["sem_mse_loss"] = sem_out["mse_loss"]
            total = total + distill + sem_out["mse_loss"] + vit_distill

        if cfg.enable_pixel_branch:
            pix_patch = 1 if cfg.decoder_type == "dcae" else cfg.patch_size
            if cfg.decoder_type == "dcae":
                cond = self._run_pixel_trunk_dcae(
                    latent, pixel_values.shape[1:3])
            else:
                cond, _ = self._run_pixel_trunk(latent)
            target_latent = C.p2l_transform(
                pixel_values.astype(jnp.float32), pix_patch
            )
            pix_out = self.flow_head.forward_train(target_latent, cond, rng_pix)
            losses["flow_loss"] = pix_out["mse_loss"]
            lpips = jnp.float32(0.0)
            if lpips_fn is not None:
                pred_img = C.l2p_transform(pix_out["pred"], pix_patch)
                pred_img = jnp.clip(pred_img, -1, 1) * 0.5 + 0.5
                tgt_img = jnp.clip(pixel_values, -1, 1) * 0.5 + 0.5
                lpips = lpips_fn(pred_img, tgt_img)
            losses["lpips_loss"] = lpips
            total = total + pix_out["mse_loss"] + lpips

        losses["loss"] = total
        return losses

    # ---- inference ----

    def __call__(self, pixel_values, rng, mode: str = "pixel",
                 normalize_type: str = "siglip"):
        assert mode in ("pixel", "semantic")
        _, _, latent = self.forward_encoder(pixel_values, normalize_type)
        if mode == "pixel":
            if self.cfg.decoder_type == "dcae":
                cond = self._run_pixel_trunk_dcae(
                    latent, pixel_values.shape[1:3])
            else:
                cond, _ = self._run_pixel_trunk(latent)
            return self.flow_head.sample(cond, rng)
        cond, _ = self._run_semantic_trunk(latent)
        return self.sem_flow_head.sample(cond, rng, as_image=False)


def _param_free_layer_norm(x, eps: float = 0.0):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return ((xf - mu) / jnp.sqrt(var + eps)).astype(x.dtype)


def _interp_pos(pos_embed, grid: int):
    n = pos_embed.shape[1]
    orig = int(round(np.sqrt(n)))
    if orig == grid:
        return pos_embed
    pe = pos_embed.astype(jnp.float32).reshape(1, orig, orig, -1)
    pe = jax.image.resize(pe, (1, grid, grid, pe.shape[-1]), method="cubic")
    return pe.reshape(1, grid * grid, -1)
