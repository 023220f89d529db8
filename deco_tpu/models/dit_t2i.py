"""Text-to-image DiT models: PixNerd t2i and the DeCo t2i (config-implied).

The reference snapshot's ``dit_t2i_DeCo.py`` was overwritten mid-research into
a ReCo reconstruction variant (SURVEY.md caveat 2); the true DeCo t2i
architecture implied by ``configs_t2i/sft_res512.yaml:44-55`` is the PixNerd
t2i trunk (``src/models/transformer/dit_t2i_pixnerd.py:201-310``) with the
NerfBlock hyper-decoder replaced by the DeCo ``SimpleMLPAdaLN`` pixel decoder
(``dit_t2i_DeCo.py:232-316``). Both variants are implemented here over a shared
encoder:

- text path: linear y_embedder (+RMSNorm) from Qwen3 embeddings + learnable
  text positional embedding + ``num_text_blocks`` self-attention refine blocks
  conditioned on silu(t);
- image path: joint-attention encoder blocks (image q over concat(image kv,
  text kv), RoPE on image only);
- decoder: per-patch NerfBlocks (PixNerd) or SimpleMLPAdaLN (DeCo).

The t2i trunk uses the *extrapolating* RoPE (``precompute_freqs_cis_ex2d``,
rope.py:30-46) so arbitrary resolutions work at inference via
``patch_scaling_hw`` (the demo's ``decoder_patch_scaling_h/w``, app.py:91-94).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from deco_tpu.models import layers
from deco_tpu.models.patching import patchify, unpatchify


def nerf_rope_cos_basis(patch_size: int, max_freqs: int) -> np.ndarray:
    """t2i NerfEmbedder positional basis (dit_t2i_pixnerd.py:96-100).

    The reference calls ``precompute_freqs_cis_ex2d(max_freqs**2 * 2, P, P)``
    and casts complex->real, keeping only the cosine parts: a (P^2, max_freqs^2)
    table of cos(pos * freq) with x/y interleaved per frequency.
    """
    dim = max_freqs**2 * 2
    x_pos = np.linspace(0, patch_size, patch_size)  # height*scale with scale=1
    y_pos = np.linspace(0, patch_size, patch_size)
    y_grid, x_grid = np.meshgrid(y_pos, x_pos, indexing="ij")
    y_flat, x_flat = y_grid.reshape(-1), x_grid.reshape(-1)
    freqs = 1.0 / (10000.0 ** (np.arange(0, dim, 4)[: dim // 4] / dim))
    x_ang = np.outer(x_flat, freqs)
    y_ang = np.outer(y_flat, freqs)
    basis = np.stack([np.cos(x_ang), np.cos(y_ang)], axis=-1)
    return basis.reshape(patch_size**2, -1).astype(np.float32)


class NerfEmbedderT2I(nn.Module):
    """Per-pixel embed with the cos-RoPE basis (t2i variant)."""

    hidden_size: int
    max_freqs: int = 8
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        p2 = x.shape[-2]
        patch_size = int(round(p2**0.5))
        basis = jnp.asarray(
            nerf_rope_cos_basis(patch_size, self.max_freqs), self.dtype
        )
        basis = jnp.broadcast_to(basis, x.shape[:-1] + (self.max_freqs**2,))
        x = jnp.concatenate([x.astype(self.dtype), basis], axis=-1)
        return nn.Dense(self.hidden_size, dtype=self.dtype, name="embedder")(x)


class _JointScanCell(nn.Module):
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Any = jnp.bfloat16
    align_layer: int = 0
    quantize: bool = False

    @nn.compact
    def __call__(self, carry, y, c, rope):
        x, feat, idx = carry
        x = layers.JointDiTBlock(
            num_heads=self.num_heads, mlp_ratio=self.mlp_ratio, dtype=self.dtype,
            name="block", quantize=self.quantize,
        )(x, y, c, rope)
        if self.align_layer:
            feat = jnp.where(idx == self.align_layer - 1, x, feat)
        return (x, feat, idx + 1), None


class _TextScanCell(nn.Module):
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Any = jnp.bfloat16
    quantize: bool = False

    @nn.compact
    def __call__(self, carry, c):
        y = layers.TextRefineBlock(
            num_heads=self.num_heads, mlp_ratio=self.mlp_ratio, dtype=self.dtype,
            name="block", quantize=self.quantize,
        )(carry, c)
        return y, None


class _T2ITrunk(nn.Module):
    """Shared text-refine + joint-attention encoder trunk."""

    in_channels: int = 3
    patch_size: int = 16
    num_groups: int = 24
    hidden_size: int = 1536
    num_encoder_blocks: int = 16
    num_text_blocks: int = 4
    txt_embed_dim: int = 2048
    txt_max_length: int = 128
    dtype: Any = jnp.bfloat16
    grad_checkpoint: bool = False
    align_layer: int = 0
    patch_scaling_hw: Tuple[float, float] = (1.0, 1.0)
    # "sp": run the joint-attention encoder blocks sequence-parallel over the
    # mesh `model` axis (image tokens sharded, text KV replicated — see
    # parallel/sp_trunk.sequence_parallel_joint_trunk). Same contract as the
    # c2i knob (dit_c2i_deco.DeCoC2I.trunk_parallel): init always builds the
    # sequential layout; the executor resolves the ambient jax.set_mesh mesh.
    trunk_parallel: str = "none"
    # W8A8 int8 trunk GEMMs (same contract as DeCoC2I.quantize): None/"" =
    # exact bf16, "int8" = quantized text-refine + joint blocks. Inference
    # only; DECO_QUANT=int8 forces it globally.
    quantize: Any = None

    @nn.compact
    def __call__(self, x_patches, t, y, gh, gw, return_features=False):
        from deco_tpu.ops.quant import env_quant_mode

        if self.quantize not in (None, "", "int8"):
            raise ValueError(
                f"quantize={self.quantize!r}: expected None or 'int8'"
            )
        quant = (self.quantize or env_quant_mode()) == "int8"
        if quant and self.trunk_parallel != "none":
            # the sp/tp executors consume the stacked params directly and
            # would silently drop the int8 path — fail loudly instead
            raise ValueError(
                "quantize='int8' is not available under trunk_parallel "
                "executors; use the sequential trunk for int8 serving"
            )
        b = x_patches.shape[0]
        rope = layers.precompute_rope_2d(
            self.hidden_size // self.num_groups, gh, gw,
            scale=self.patch_scaling_hw, extrapolate=True,
        )
        t_emb = layers.TimestepEmbedder(
            self.hidden_size, dtype=self.dtype, name="t_embedder"
        )(t.reshape(-1)).reshape(b, 1, self.hidden_size)
        y_emb = layers.Embed(
            self.hidden_size, use_norm=True, dtype=self.dtype, name="y_embedder"
        )(y.astype(self.dtype))
        y_pos = self.param(
            "y_pos_embedding",
            nn.initializers.normal(stddev=1.0),
            (1, self.txt_max_length, self.hidden_size),
            jnp.float32,
        )
        y_emb = y_emb + y_pos.astype(self.dtype)
        condition = nn.silu(t_emb)

        text_cell = _TextScanCell
        joint_cell = _JointScanCell
        if self.grad_checkpoint:
            text_cell = nn.remat(text_cell, prevent_cse=False)
            joint_cell = nn.remat(joint_cell, prevent_cse=False)

        y_emb, _ = nn.scan(
            text_cell,
            # "quant": cached int8 weights (layers.Int8Dense), stacked like
            # params; a no-op when absent (exact bf16 path)
            variable_axes={"params": 0, "quant": 0},
            split_rngs={"params": True},
            in_axes=(nn.broadcast,),
            length=self.num_text_blocks,
            metadata_params={nn.meta.PARTITION_NAME: None},
        )(num_heads=self.num_groups, dtype=self.dtype,
          name="text_refine_blocks", quantize=quant)(
            y_emb, condition
        )

        s = layers.Embed(self.hidden_size, dtype=self.dtype, name="s_embedder")(
            x_patches
        )
        if self.trunk_parallel not in ("none", "sp", "tp"):
            raise ValueError(
                f"trunk_parallel={self.trunk_parallel!r}: the t2i joint trunk "
                "supports 'none', 'sp' (ring attention with replicated text "
                "KV), or 'tp' (Megatron head/width split)"
            )
        if self.trunk_parallel != "none" and not self.is_initializing():
            # Bound-apply only: params exist in the sequential nn.scan layout
            # (init always takes the else branch), so checkpoints are
            # identical across modes — same contract as the c2i knob.
            if return_features and self.align_layer:
                raise ValueError(
                    "the REPA feature tap is not available under "
                    "trunk_parallel; train alignment with the sequential "
                    "trunk"
                )
            from deco_tpu.parallel import sp_trunk, tp_trunk

            stacked = self.variables["params"]["blocks"]["block"]
            if self.trunk_parallel == "sp":
                s = sp_trunk.sequence_parallel_joint_trunk(
                    stacked, s, y_emb, condition, rope,
                    num_heads=self.num_groups, dtype=self.dtype,
                    remat=self.grad_checkpoint,
                )
            else:
                s = tp_trunk.tensor_parallel_joint_trunk(
                    stacked, s, y_emb, condition, rope,
                    num_heads=self.num_groups, dtype=self.dtype,
                    remat=self.grad_checkpoint,
                )
            feat = jnp.zeros_like(s)
        else:
            scanned = nn.scan(
                joint_cell,
                variable_axes={"params": 0, "quant": 0},
                split_rngs={"params": True},
                in_axes=(nn.broadcast, nn.broadcast, nn.broadcast),
                length=self.num_encoder_blocks,
                metadata_params={nn.meta.PARTITION_NAME: None},
            )(
                num_heads=self.num_groups, dtype=self.dtype,
                align_layer=self.align_layer if return_features else 0,
                name="blocks", quantize=quant,
            )
            (s, feat, _), _ = scanned(
                (s, jnp.zeros_like(s), jnp.int32(0)), y_emb, condition, rope
            )
        s = nn.silu(t_emb + s)
        return s, feat


class PixNerdT2I(nn.Module):
    """PixNerd t2i: joint-attention encoder + NerfBlock hyper-decoder."""

    in_channels: int = 3
    patch_size: int = 16
    num_groups: int = 24
    hidden_size: int = 1536
    decoder_hidden_size: int = 64
    num_encoder_blocks: int = 16
    num_decoder_blocks: int = 4
    num_text_blocks: int = 4
    txt_embed_dim: int = 2048
    txt_max_length: int = 128
    nerf_mlpratio: int = 2
    max_freqs: int = 8
    dtype: Any = jnp.bfloat16
    grad_checkpoint: bool = False
    align_layer: int = 0
    patch_scaling_hw: Tuple[float, float] = (1.0, 1.0)
    trunk_parallel: str = "none"  # "sp" | "tp" joint-trunk executors
    # W8A8 int8 trunk serving mode (ops/quant.py; same contract as
    # DeCoC2I.quantize): inference-only, checkpoints layout-identical
    quantize: Any = None

    @nn.compact
    def __call__(self, x, t, y, return_features: bool = False):
        b, h, w, _ = x.shape
        p = self.patch_size
        gh, gw = h // p, w // p
        x_patches = patchify(x, p).astype(self.dtype)
        s, feat = _T2ITrunk(
            in_channels=self.in_channels, patch_size=p,
            num_groups=self.num_groups, hidden_size=self.hidden_size,
            num_encoder_blocks=self.num_encoder_blocks,
            num_text_blocks=self.num_text_blocks,
            txt_embed_dim=self.txt_embed_dim, txt_max_length=self.txt_max_length,
            dtype=self.dtype, grad_checkpoint=self.grad_checkpoint,
            align_layer=self.align_layer,
            patch_scaling_hw=self.patch_scaling_hw,
            trunk_parallel=self.trunk_parallel, quantize=self.quantize,
            name="trunk",
        )(x_patches, t, y, gh, gw, return_features)

        x_pix = x_patches.reshape(b, gh * gw, p * p, self.in_channels)
        x_pix = NerfEmbedderT2I(
            self.decoder_hidden_size, max_freqs=self.max_freqs, dtype=self.dtype,
            name="x_embedder",
        )(x_pix)
        for i in range(self.num_decoder_blocks):
            x_pix = layers.NerfBlock(
                mlp_ratio=self.nerf_mlpratio, normalize_fc2=False, dtype=self.dtype,
                name=f"nerf_blocks_{i}",
            )(x_pix, s)
        # t2i NerfFinalLayer: plain zero-init linear, no norm (dit_t2i_pixnerd.py:137-143)
        out = nn.Dense(
            self.in_channels, dtype=self.dtype,
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            name="final_linear",
        )(x_pix)
        out = out.reshape(b, gh * gw, p * p * self.in_channels)
        img = unpatchify(out.astype(jnp.float32), gh, gw, p)
        if return_features:
            return img, feat
        return img


class DeCoT2I(nn.Module):
    """DeCo t2i (config-implied): PixNerd trunk + SimpleMLPAdaLN pixel decoder.

    Matches ``configs_t2i/sft_res512.yaml:44-55``: hidden 1536, 24 heads,
    16 encoder blocks, 3 decoder res-blocks, 4 text blocks, txt_embed 2048,
    txt_len 128, decoder hidden 32 -> DeCo-XXL/16 (1.1B).
    """

    in_channels: int = 3
    patch_size: int = 16
    num_groups: int = 24
    hidden_size: int = 1536
    decoder_hidden_size: int = 32
    num_encoder_blocks: int = 16
    num_decoder_blocks: int = 3
    num_text_blocks: int = 4
    txt_embed_dim: int = 2048
    txt_max_length: int = 128
    max_freqs: int = 8
    dtype: Any = jnp.bfloat16
    grad_checkpoint: bool = False
    align_layer: int = 0
    patch_scaling_hw: Tuple[float, float] = (1.0, 1.0)
    trunk_parallel: str = "none"  # "sp" | "tp" joint-trunk executors
    # >1: lax.scan the per-patch pixel decoder over L-chunks under
    # whole-chunk remat so the (B, L, P^2, C) per-pixel intermediates only
    # live for L/chunks patches at a time — the same 512px+ HBM-peak breaker
    # as DeCoC2I.decoder_chunks (the t2i decoder is the identical
    # SimpleMLPAdaLN at P=16, so the peak is 4x the c2i-at-256px one per
    # token). Chunked and unchunked share parameter paths.
    decoder_chunks: int = 0
    # W8A8 int8 trunk serving mode (ops/quant.py; same contract as
    # DeCoC2I.quantize): inference-only, checkpoints layout-identical
    quantize: Any = None

    @nn.compact
    def __call__(self, x, t, y, return_features: bool = False):
        b, h, w, _ = x.shape
        p = self.patch_size
        gh, gw = h // p, w // p
        x_patches = patchify(x, p).astype(self.dtype)
        s, feat = _T2ITrunk(
            in_channels=self.in_channels, patch_size=p,
            num_groups=self.num_groups, hidden_size=self.hidden_size,
            num_encoder_blocks=self.num_encoder_blocks,
            num_text_blocks=self.num_text_blocks,
            txt_embed_dim=self.txt_embed_dim, txt_max_length=self.txt_max_length,
            dtype=self.dtype, grad_checkpoint=self.grad_checkpoint,
            align_layer=self.align_layer,
            patch_scaling_hw=self.patch_scaling_hw,
            trunk_parallel=self.trunk_parallel, quantize=self.quantize,
            name="trunk",
        )(x_patches, t, y, gh, gw, return_features)

        x_pix = x_patches.reshape(b, gh * gw, p * p, self.in_channels)
        x_pix = layers.NerfEmbedder(
            self.decoder_hidden_size, max_freqs=self.max_freqs, dtype=self.dtype,
            name="x_embedder",
        )(x_pix)
        dec_fields = dict(
            model_channels=self.decoder_hidden_size,
            out_channels=self.in_channels,
            num_res_blocks=self.num_decoder_blocks,
            patch_size=p,
            dtype=self.dtype,
        )
        out = layers.run_pixel_decoder(
            x_pix, s, decoder_chunks=self.decoder_chunks,
            grad_checkpoint=self.grad_checkpoint, **dec_fields,
        )
        out = out.reshape(b, gh * gw, p * p * self.in_channels)
        img = unpatchify(out.astype(jnp.float32), gh, gw, p)
        if return_features:
            return img, feat
        return img
