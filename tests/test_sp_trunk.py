"""Sequence-parallel trunk (parallel/sp_trunk.py) vs the sequential scan.

Context parallelism end-to-end: activations sharded over the sequence, ring
attention inside every block. No reference counterpart (SURVEY §5); the bar
is equality with the sequential ``run_dit_blocks`` trunk, fwd and grad.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from deco_tpu.models import layers
from deco_tpu.models.dit_c2i_deco import run_dit_blocks
from deco_tpu.parallel import mesh as mesh_lib
from deco_tpu.parallel.sp_trunk import sequence_parallel_trunk

HIDDEN, HEADS, LAYERS, N = 64, 4, 4, 64


class _Trunk(nn.Module):
    @nn.compact
    def __call__(self, x, c, rope):
        out, _ = run_dit_blocks(
            x, c, rope, None, num_blocks=LAYERS, num_heads=HEADS,
            dtype=jnp.float32,
        )
        return out


def _setup(batch=4):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(batch, N, HIDDEN), jnp.float32)
    c = jnp.asarray(rng.randn(batch, 1, HIDDEN), jnp.float32)
    rope = layers.precompute_rope_2d(HIDDEN // HEADS, 8, 8)
    model = _Trunk()
    params = model.init(jax.random.PRNGKey(0), x, c, rope)
    seq = model.apply(params, x, c, rope)
    return x, c, rope, params["params"]["blocks"]["block"], seq


@pytest.mark.parametrize("data,ring", [(2, 4), (1, 8)])
def test_sp_trunk_matches_sequential(data, ring):
    mesh = mesh_lib.make_mesh(data=data, model=ring)
    x, c, rope, stacked, seq = _setup()
    out = sequence_parallel_trunk(
        stacked, x, c, rope, mesh=mesh, num_heads=HEADS, dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(seq), atol=2e-4)


M_TXT = 12  # text length (not divisible by the ring — replicated, not sharded)


def _setup_joint(batch=4):
    from tests.joint_trunk_util import setup_joint

    return setup_joint(HIDDEN, HEADS, LAYERS, N, M_TXT, batch=batch)


@pytest.mark.parametrize("data,ring", [(2, 4), (1, 8)])
def test_joint_sp_trunk_matches_sequential(data, ring):
    """t2i joint trunk: image tokens ride the ring, text KV is replicated
    and seeds the (o, lse) accumulator — equality with the dense concat."""
    from deco_tpu.parallel.sp_trunk import sequence_parallel_joint_trunk

    mesh = mesh_lib.make_mesh(data=data, model=ring)
    x, y, c, rope, stacked, seq, _ = _setup_joint()
    out = sequence_parallel_joint_trunk(
        stacked, x, y, c, rope, mesh=mesh, num_heads=HEADS, dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(seq), atol=2e-4)


def test_joint_sp_trunk_grad_matches_sequential():
    from deco_tpu.parallel.sp_trunk import sequence_parallel_joint_trunk

    mesh = mesh_lib.make_mesh(data=2, model=4)
    x, y, c, rope, stacked, seq, jt_model = _setup_joint()

    @jax.jit
    def loss_sp(p, x, y):
        out = sequence_parallel_joint_trunk(
            p, x, y, c, rope, mesh=mesh, num_heads=HEADS, dtype=jnp.float32,
            remat=True,
        )
        return jnp.mean(out ** 2)

    def loss_seq(p, x, y):
        out = jt_model.apply(
            {"params": {"blocks": {"block": p}}}, x, y, c, rope
        )
        return jnp.mean(out ** 2)

    l_sp, g_sp = jax.value_and_grad(loss_sp)(stacked, x, y)
    l_sq, g_sq = jax.value_and_grad(loss_seq)(stacked, x, y)
    np.testing.assert_allclose(float(l_sp), float(l_sq), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4
        ),
        g_sp, g_sq,
    )


def test_sp_trunk_grad_matches_sequential():
    """Training path: remat'd SP trunk gradients equal the sequential ones."""
    mesh = mesh_lib.make_mesh(data=2, model=4)
    x, c, rope, stacked, seq = _setup()

    @jax.jit
    def loss_sp(p, x):
        out = sequence_parallel_trunk(
            p, x, c, rope, mesh=mesh, num_heads=HEADS, dtype=jnp.float32,
            remat=True,
        )
        return jnp.mean(out ** 2)

    def loss_seq(p, x):
        model = _Trunk()
        out = model.apply({"params": {"blocks": {"block": p}}}, x, c, rope)
        return jnp.mean(out ** 2)

    l_sp, g_sp = jax.value_and_grad(loss_sp)(stacked, x)
    l_sq, g_sq = jax.value_and_grad(loss_seq)(stacked, x)
    np.testing.assert_allclose(float(l_sp), float(l_sq), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4
        ),
        g_sp, g_sq,
    )
