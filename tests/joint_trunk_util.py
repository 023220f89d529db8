"""Shared sequential-reference t2i joint trunk for the SP/TP executor tests.

One copy of the nn.scan-over-JointDiTBlock layout (mirroring
dit_t2i._T2ITrunk) so test_sp_trunk.py and test_tp_trunk.py assert parity
against the same reference; geometry is parameterized per suite.
"""

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from deco_tpu.models import layers


def make_joint_trunk(num_heads, num_layers, dtype=jnp.float32):
    class _JointTrunk(nn.Module):
        @nn.compact
        def __call__(self, x, y, c, rope):
            class Cell(nn.Module):
                @nn.compact
                def __call__(self, carry, y, c, rope):
                    out = layers.JointDiTBlock(
                        num_heads=num_heads, dtype=dtype, name="block"
                    )(carry, y, c, rope)
                    return out, None

            x, _ = nn.scan(
                Cell,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                in_axes=(nn.broadcast, nn.broadcast, nn.broadcast),
                length=num_layers,
                metadata_params={nn.meta.PARTITION_NAME: None},
            )(name="blocks")(x, y, c, rope)
            return x

    return _JointTrunk()


def setup_joint(hidden, heads, layers_n, n_img, m_txt, batch=4, grid=None):
    """Init the sequential joint trunk and return
    (x, y, c, rope, stacked_block_params, sequential_output, model)."""
    gh = gw = grid if grid else int(round(n_img ** 0.5))
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(batch, n_img, hidden), jnp.float32)
    y = jnp.asarray(rng.randn(batch, m_txt, hidden), jnp.float32)
    c = jnp.asarray(rng.randn(batch, 1, hidden), jnp.float32)
    rope = layers.precompute_rope_2d(hidden // heads, gh, gw,
                                     extrapolate=True)
    model = make_joint_trunk(heads, layers_n)
    params = model.init(jax.random.PRNGKey(0), x, y, c, rope)
    seq = model.apply(params, x, y, c, rope)
    return x, y, c, rope, params["params"]["blocks"]["block"], seq, model
