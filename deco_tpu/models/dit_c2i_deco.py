"""DeCo class-to-image model: semantic DiT encoder + per-patch pixel decoder.

TPU-native Flax re-design of the reference ``PixNerDiT``
(``src/models/transformer/dit_c2i_DeCo.py:417-536`` of hhhhzp/DeCo,
config ``configs_c2i/DeCo_XL.yaml:44-55``):

- NHWC input; patchify/unpatchify are reshapes (:mod:`deco_tpu.models.patching`).
- The ``num_cond_blocks`` DiT blocks run under ``nn.scan`` (one compiled block
  body, stacked params) — compile time stays ~constant in depth; the REPA
  alignment layer's activations are tapped via a scan carry instead of a
  forward hook, without materializing every layer's output.
- The pixel decoder (``SimpleMLPAdaLN``) operates on (B, L, P^2, C) without the
  reference's (B*L) flattening — identical math, XLA-friendly shapes.
- bf16 compute / fp32 params; RoPE tables and DCT positional bases are
  precomputed fp32 constants keyed on the static (H, W).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from deco_tpu.models import layers
from deco_tpu.models.patching import patchify, unpatchify


class _DiTScanCell(nn.Module):
    """Scan cell: one DiT block + feature-tap bookkeeping in the carry."""

    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Any = jnp.bfloat16
    align_layer: int = 0  # 1-based; 0 disables the tap
    quantize: bool = False

    @nn.compact
    def __call__(self, carry, c, rope, mask):
        x, feat, idx = carry
        x = layers.FlattenDiTBlock(
            num_heads=self.num_heads, mlp_ratio=self.mlp_ratio, dtype=self.dtype,
            name="block", quantize=self.quantize,
        )(x, c, rope, mask)
        if self.align_layer:
            feat = jnp.where(idx == self.align_layer - 1, x, feat)
        return (x, feat, idx + 1), None


def run_dit_blocks(
    x, c, rope, mask, *, num_blocks, num_heads, mlp_ratio=4.0,
    dtype=jnp.bfloat16, grad_checkpoint=False, align_layer=0, name="blocks",
    remat_policy="full", quantize=False,
):
    """Run a stack of FlattenDiTBlocks under nn.scan; returns (x, tapped_feat).

    ``remat_policy`` (only with grad_checkpoint): "full" recomputes the whole
    block in backward; "dots" saves matmul outputs and recomputes only
    elementwise ops (``jax.checkpoint_policies.checkpoint_dots``); "attn"
    saves ONLY the attention outputs + flash lse (checkpoint_name tags in
    layers.sdpa / ops.flash_attention) so the backward recompute skips the
    attention forward but re-derives everything else — the middle ground
    between dots (too much HBM) and full (recomputes attention). Measured
    on v5e-1 (DeCo-XL 256px): dots OOMs at b24 (needs 16.8G) and at b20
    delivers 62.0 img/s vs full-remat's 65.8 at b24 — the recompute saving
    loses to reading the saved dot outputs back from HBM, so "full" stays the
    single-chip default. The knob exists for fsdp-sharded multi-chip runs
    where the 11G optimizer state divides across the mesh and dots fits at
    full batch."""
    cell = _DiTScanCell
    if grad_checkpoint and remat_policy != "none":
        # "none" skips trunk remat entirely (decoder keeps full remat via
        # grad_checkpoint): saves the trunk's 1x-forward recompute in bwd at
        # the cost of storing trunk activations
        if remat_policy == "dots":
            cell = nn.remat(
                cell, prevent_cse=False,
                policy=jax.checkpoint_policies.checkpoint_dots,
            )
        elif remat_policy == "attn":
            cell = nn.remat(
                cell, prevent_cse=False,
                policy=jax.checkpoint_policies.save_only_these_names(
                    "attn_out", "attn_lse"),
            )
        else:
            cell = nn.remat(cell, prevent_cse=False)
    scanned = nn.scan(
        cell,
        # "quant" holds the cached int8 trunk weights (models/layers.Int8Dense
        # / SwiGLU under quantize=True); stacked along the block axis like
        # params. A no-op when the collection is absent (exact bf16 path).
        variable_axes={"params": 0, "quant": 0},
        split_rngs={"params": True},
        in_axes=(nn.broadcast, nn.broadcast, nn.broadcast),
        length=num_blocks,
        metadata_params={nn.meta.PARTITION_NAME: None},
    )(
        num_heads=num_heads, mlp_ratio=mlp_ratio, dtype=dtype,
        align_layer=align_layer, name=name, quantize=quantize,
    )
    feat0 = jnp.zeros_like(x)
    (x, feat, _), _ = scanned((x, feat0, jnp.int32(0)), c, rope, mask)
    return x, feat


class DeCoC2I(nn.Module):
    """Frequency-decoupled pixel-diffusion DiT (c2i).

    DeCo-XL/16: in_channels=3, patch=16, heads=16, hidden=1152, hidden_x=32,
    num_blocks=31, num_cond_blocks=28 -> 682M params.
    """

    in_channels: int = 3
    patch_size: int = 16
    num_groups: int = 12
    hidden_size: int = 1152
    hidden_size_x: int = 64
    nerf_mlpratio: int = 4  # accepted for config parity; unused by this decoder
    num_blocks: int = 18
    num_cond_blocks: int = 4
    num_classes: int = 1000
    max_freqs: int = 8
    dtype: Any = jnp.bfloat16
    grad_checkpoint: bool = False
    # trunk remat policy when grad_checkpoint: "full" | "dots" | "attn" |
    # "none" (see run_dit_blocks; the decoder always uses full per-block
    # remat)
    trunk_remat_policy: str = "full"
    # >1: run the per-patch pixel decoder as a lax.scan over L-chunks so the
    # (B, L, P^2, C) per-pixel intermediates only materialize for L/chunks
    # patches at a time (the measured 512px training HBM peak; the reference
    # works around it with accumulate_grad_batches, configs_c2i/
    # DeCo_XL_512.yaml:15). Chunked and unchunked share parameter paths.
    decoder_chunks: int = 0
    align_layer: int = 0  # REPA feature tap (1-based block index); 0 = off
    # RoPE positions span [0, rope_scale] regardless of grid size (rope.py:5)
    rope_scale: float = 16.0
    # Run the cond-block trunk under a parallel executor over the mesh's
    # `model` axis: "none" (sequential nn.scan), "sp" (sequence-parallel:
    # activations sharded over tokens, ring attention —
    # parallel/sp_trunk.py), "tp" (Megatron-style: heads + SwiGLU width
    # sharded, two psums per block — parallel/tp_trunk.py). The executors
    # resolve the ambient jax.set_mesh mesh (the Experiment loops establish
    # one; config: set `mesh_model_axis` > 1 and `model.trunk_parallel`).
    # Init always builds params via the sequential path, so checkpoints are
    # layout-identical across modes.
    trunk_parallel: str = "none"
    # Opt-in W8A8 int8 trunk GEMMs for sampling/serving (ops/quant.py):
    # None/"" = exact bf16 (default; golden-parity path), "int8" = quantized.
    # DECO_QUANT=int8 forces it on globally. Attention math, adaLN, the
    # embedders and the per-pixel decoder stay bf16; checkpoints are
    # layout-identical across modes. Inference-only — incompatible with
    # training gradients.
    quantize: Any = None

    @nn.compact
    def __call__(self, x, t, y, s=None, mask=None, return_s: bool = False,
                 return_features: bool = False):
        """x: (B, H, W, C) NHWC; t: (B,) in [0,1]; y: (B,) int class labels."""
        b, h, w, _ = x.shape
        p = self.patch_size
        gh, gw = h // p, w // p
        from deco_tpu.ops.quant import env_quant_mode

        quant = (self.quantize or env_quant_mode()) == "int8"
        if self.quantize not in (None, "", "int8"):
            raise ValueError(
                f"quantize={self.quantize!r}: expected None or 'int8'"
            )
        if quant and self.trunk_parallel != "none":
            # the sp/tp executors consume the stacked params directly and
            # would silently drop the int8 path — fail loudly instead
            raise ValueError(
                "quantize='int8' is not available under trunk_parallel "
                "executors; use the sequential trunk for int8 serving"
            )
        rope = layers.precompute_rope_2d(
            self.hidden_size // self.num_groups, gh, gw, scale=self.rope_scale
        )

        x_patches = patchify(x, p).astype(self.dtype)  # (B, L, P*P*C)

        t_emb = layers.TimestepEmbedder(
            self.hidden_size, dtype=self.dtype, name="t_embedder"
        )(t.reshape(-1)).reshape(b, 1, self.hidden_size)
        y_emb = layers.LabelEmbedder(
            self.num_classes + 1, self.hidden_size, dtype=self.dtype, name="y_embedder"
        )(y).reshape(b, 1, self.hidden_size)
        c = nn.silu(t_emb + y_emb)

        feat = None
        if s is None:
            s = layers.Embed(
                self.hidden_size, dtype=self.dtype, name="s_embedder"
            )(x_patches)
            if self.trunk_parallel not in ("none", "sp", "tp"):
                raise ValueError(
                    f"trunk_parallel={self.trunk_parallel!r}: expected "
                    "'none', 'sp', or 'tp'"
                )
            if self.trunk_parallel != "none" and not self.is_initializing():
                # Bound-apply path only: params were created (sequential
                # layout) at init; read the stacked blocks/block subtree and
                # hand it to the shard_map executor. Gradients flow through
                # self.variables as through any other param use.
                if return_features and self.align_layer:
                    raise ValueError(
                        "the REPA feature tap is not available under "
                        "trunk_parallel (the executors do not carry the "
                        "per-layer tap); train REPA with the sequential "
                        "trunk"
                    )
                if mask is not None:
                    raise ValueError(
                        "trunk_parallel executors are unmasked (ring/TP "
                        "attention); c2i never passes a mask"
                    )
                from deco_tpu.parallel import sp_trunk, tp_trunk

                stacked = self.variables["params"]["blocks"]["block"]
                if self.trunk_parallel == "sp":
                    s = sp_trunk.sequence_parallel_trunk(
                        stacked, s, c, rope, num_heads=self.num_groups,
                        dtype=self.dtype, remat=self.grad_checkpoint,
                    )
                else:
                    s = tp_trunk.tensor_parallel_trunk(
                        stacked, s, c, rope, num_heads=self.num_groups,
                        dtype=self.dtype, remat=self.grad_checkpoint,
                    )
            else:
                s, feat = run_dit_blocks(
                    s, c, rope, mask,
                    num_blocks=self.num_cond_blocks,
                    num_heads=self.num_groups,
                    dtype=self.dtype,
                    grad_checkpoint=self.grad_checkpoint,
                    align_layer=self.align_layer if return_features else 0,
                    name="blocks",
                    remat_policy=self.trunk_remat_policy,
                    quantize=quant,
                )
            s = nn.silu(t_emb + s)

        # ---- per-patch pixel decoder ----
        x_pix = x_patches.reshape(b, gh * gw, p * p, self.in_channels)
        x_pix = layers.NerfEmbedder(
            self.hidden_size_x, max_freqs=self.max_freqs, dtype=self.dtype,
            name="x_embedder",
        )(x_pix)
        dec_fields = dict(
            model_channels=self.hidden_size_x,
            out_channels=self.in_channels,
            num_res_blocks=self.num_blocks - self.num_cond_blocks,
            patch_size=p,
            dtype=self.dtype,
        )
        out = layers.run_pixel_decoder(
            x_pix, s, decoder_chunks=self.decoder_chunks,
            grad_checkpoint=self.grad_checkpoint, **dec_fields,
        )
        out = out.reshape(b, gh * gw, p * p * self.in_channels)
        img = unpatchify(out.astype(jnp.float32), gh, gw, p)

        if return_s and return_features:
            return img, s.reshape(b, gh, gw, self.hidden_size), feat
        if return_s:
            return img, s.reshape(b, gh, gw, self.hidden_size)
        if return_features:
            return img, feat
        return img
