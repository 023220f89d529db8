"""Parameter freezing: the functional equivalent of the reference's no_grad.

Reference ``src/utils/no_grad.py:3-16`` freezes modules by flipping
requires_grad; under optax the same is a masked zero-update so frozen subtrees
keep their values and optimizer state stays empty for them. Used for the
UniFlow freeze flags (frozen_encoder/frozen_mlp,
``src/lightning_uniflow_model.py:224-275``) and frozen VAE towers.
"""

from __future__ import annotations

from typing import Sequence

import jax
import optax


def freeze_mask(params, frozen_prefixes: Sequence[str]):
    """True = trainable, False = frozen; matched on top-level path prefixes
    joined by '/' (e.g. 'vision/encoder')."""

    def label(path, _):
        joined = "/".join(
            p.key if hasattr(p, "key") else str(p) for p in path
        )
        return not any(joined.startswith(pre) for pre in frozen_prefixes)

    return jax.tree_util.tree_map_with_path(label, params)


def with_frozen(tx: optax.GradientTransformation, params,
                frozen_prefixes: Sequence[str]) -> optax.GradientTransformation:
    """Wrap an optimizer so params under ``frozen_prefixes`` never update."""
    mask = freeze_mask(params, frozen_prefixes)
    return optax.multi_transform(
        {True: tx, False: optax.set_to_zero()},
        jax.tree.map(lambda m: m, mask),
    )
