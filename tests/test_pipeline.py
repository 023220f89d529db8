"""Pipeline-parallel trunk (parallel/pipeline.py) vs the sequential scan.

The reference is DP-only (SURVEY §2.10); pipeline parallelism is a
deco_tpu-only scaling path, so the correctness bar is internal: the GPipe
executor must reproduce the sequential ``run_dit_blocks`` trunk bit-for-bit
(fp32) on the virtual mesh, for multiple stage/microbatch geometries.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from deco_tpu.models import layers
from deco_tpu.models.dit_c2i_deco import run_dit_blocks
from deco_tpu.parallel import mesh as mesh_lib
from deco_tpu.parallel.pipeline import dit_block_apply, pipeline_apply

HIDDEN, HEADS, LAYERS = 64, 4, 8


class _Trunk(nn.Module):
    @nn.compact
    def __call__(self, x, c, rope):
        out, _ = run_dit_blocks(
            x, c, rope, None, num_blocks=LAYERS, num_heads=HEADS,
            dtype=jnp.float32,
        )
        return out


def _setup(batch=8):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(batch, 16, HIDDEN), jnp.float32)
    c = jnp.asarray(rng.randn(batch, 1, HIDDEN), jnp.float32)
    rope = layers.precompute_rope_2d(HIDDEN // HEADS, 4, 4)
    model = _Trunk()
    params = model.init(jax.random.PRNGKey(0), x, c, rope)
    seq = model.apply(params, x, c, rope)
    stacked = params["params"]["blocks"]["block"]
    return x, c, rope, stacked, seq


@pytest.mark.parametrize(
    "data,stages,microbatches",
    [(2, 4, 4), (1, 8, 4), (4, 2, 2)],
)
def test_pipeline_matches_sequential(data, stages, microbatches):
    mesh = mesh_lib.make_mesh(data=data, model=stages)
    x, c, rope, stacked, seq = _setup()
    block = layers.FlattenDiTBlock(num_heads=HEADS, dtype=jnp.float32)
    out = pipeline_apply(
        dit_block_apply(block), stacked, x, mb_args=(c,), bcast_args=(rope,),
        mesh=mesh, num_microbatches=microbatches,
    )
    # fp32 fusion-order noise: even a manual per-layer apply differs from the
    # fused scan by ~2e-5 at activation magnitude ~5
    np.testing.assert_allclose(np.asarray(out), np.asarray(seq), atol=2e-4)


def test_pipeline_under_jit_and_grad():
    """The executor must live inside jit and differentiate (training path)."""
    mesh = mesh_lib.make_mesh(data=2, model=4)
    x, c, rope, stacked, seq = _setup()
    block = layers.FlattenDiTBlock(num_heads=HEADS, dtype=jnp.float32)

    @jax.jit
    def loss(p, x):
        out = pipeline_apply(
            dit_block_apply(block), p, x, mb_args=(c,), bcast_args=(rope,),
            mesh=mesh, num_microbatches=4,
        )
        return jnp.mean(out.astype(jnp.float32) ** 2)

    def loss_seq(p, x):
        model = _Trunk()
        out = model.apply({"params": {"blocks": {"block": p}}}, x, c, rope)
        return jnp.mean(out.astype(jnp.float32) ** 2)

    l_pp, g_pp = jax.value_and_grad(loss)(stacked, x)
    l_sq, g_sq = jax.value_and_grad(loss_seq)(stacked, x)
    np.testing.assert_allclose(float(l_pp), float(l_sq), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4
        ),
        g_pp, g_sq,
    )
