"""Patchify/unpatchify as pure reshape+transpose (TPU-native unfold/fold).

Layout note (load-bearing for checkpoint conversion): patches are flattened
pixel-major — ``(B, H, W, C) -> (B, L, P*P*C)`` with the last axis ordered
``(pixel_row, pixel_col, channel)``. The reference's ``torch.nn.functional
.unfold`` produces channel-major ``(C, P, P)`` ordering
(``src/models/transformer/dit_c2i_DeCo.py:488``); the torch->flax converter
permutes the ``s_embedder`` kernel rows accordingly. The pixel-decoder's
``(P^2, C)`` per-pixel view is identical in both layouts.
"""

from __future__ import annotations



def patchify(x, patch_size: int):
    """(B, H, W, C) -> (B, L, P*P*C), pixel-major flattening."""
    b, h, w, c = x.shape
    p = patch_size
    if h % p or w % p:
        raise ValueError(
            f"image size {h}x{w} is not divisible by patch_size={p}; "
            f"pad or resize to a multiple of {p} (serve.py rounds requested "
            f"sizes to ÷32 for this reason)"
        )
    gh, gw = h // p, w // p
    x = x.reshape(b, gh, p, gw, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, gh, gw, p, p, c)
    return x.reshape(b, gh * gw, p * p * c)


def unpatchify(x, grid_h: int, grid_w: int, patch_size: int):
    """(B, L, P*P*C) -> (B, H, W, C)."""
    b, l, d = x.shape
    p = patch_size
    c = d // (p * p)
    x = x.reshape(b, grid_h, grid_w, p, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, gh, p, gw, p, c)
    return x.reshape(b, grid_h * p, grid_w * p, c)
