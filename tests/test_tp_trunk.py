"""Tensor-parallel trunk (parallel/tp_trunk.py) vs the sequential scan.

The executor re-derives the FlattenDiTBlock math with heads / SwiGLU width
sharded and explicit psums; equality with the Flax block stack (fwd + grad)
is the correctness bar. hidden=48/heads=4 makes the SwiGLU width
int(2*4*48/3)=128 divide the tp axis sizes under test.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from deco_tpu.models import layers
from deco_tpu.models.dit_c2i_deco import run_dit_blocks
from deco_tpu.parallel import mesh as mesh_lib
from deco_tpu.parallel.tp_trunk import tensor_parallel_trunk

HIDDEN, HEADS, LAYERS, N = 48, 4, 4, 16


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
    rope = layers.precompute_rope_2d(HIDDEN // HEADS, 4, 4)
    model = _Trunk()
    params = model.init(jax.random.PRNGKey(0), x, c, rope)
    seq = model.apply(params, x, c, rope)
    return x, c, rope, params["params"]["blocks"]["block"], seq


@pytest.mark.parametrize("data,tp", [(2, 4), (4, 2)])
def test_tp_trunk_matches_sequential(data, tp):
    mesh = mesh_lib.make_mesh(data=data, model=tp)
    x, c, rope, stacked, seq = _setup()
    out = tensor_parallel_trunk(
        stacked, x, c, rope, mesh=mesh, num_heads=HEADS, dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(seq), atol=2e-4)


def test_tp_trunk_grad_matches_sequential():
    mesh = mesh_lib.make_mesh(data=2, model=4)
    x, c, rope, stacked, seq = _setup()

    @jax.jit
    def loss_tp(p, x):
        out = tensor_parallel_trunk(
            p, x, c, rope, mesh=mesh, num_heads=HEADS, dtype=jnp.float32,
        )
        return jnp.mean(out ** 2)

    def loss_seq(p, x):
        model = _Trunk()
        out = model.apply({"params": {"blocks": {"block": p}}}, x, c, rope)
        return jnp.mean(out ** 2)

    l_tp, g_tp = jax.value_and_grad(loss_tp)(stacked, x)
    l_sq, g_sq = jax.value_and_grad(loss_seq)(stacked, x)
    np.testing.assert_allclose(float(l_tp), float(l_sq), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-4
        ),
        g_tp, g_sq,
    )


M_TXT = 6  # text tokens (replicated; joint keys = concat(image, text))


def _setup_joint(batch=4):
    from tests.joint_trunk_util import setup_joint

    return setup_joint(HIDDEN, HEADS, LAYERS, N, M_TXT, batch=batch)


@pytest.mark.parametrize("data,tp", [(2, 4), (4, 2)])
def test_joint_tp_trunk_matches_sequential(data, tp):
    """t2i joint trunk under TP: image qkv AND text kv heads sharded, each
    device attends its head subset over the full concat keys locally."""
    from deco_tpu.parallel.tp_trunk import tensor_parallel_joint_trunk

    mesh = mesh_lib.make_mesh(data=data, model=tp)
    x, y, c, rope, stacked, seq, _ = _setup_joint()
    out = tensor_parallel_joint_trunk(
        stacked, x, y, c, rope, mesh=mesh, num_heads=HEADS, dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(seq), atol=2e-4)


def test_joint_tp_trunk_grad_matches_sequential():
    from deco_tpu.parallel.tp_trunk import tensor_parallel_joint_trunk

    mesh = mesh_lib.make_mesh(data=2, model=4)
    x, y, c, rope, stacked, seq, jt_model = _setup_joint()

    @jax.jit
    def loss_tp(p, x, y):
        out = tensor_parallel_joint_trunk(
            p, x, y, c, rope, mesh=mesh, num_heads=HEADS, dtype=jnp.float32,
        )
        return jnp.mean(out ** 2)

    def loss_seq(p, x, y):
        out = jt_model.apply(
            {"params": {"blocks": {"block": p}}}, x, y, c, rope
        )
        return jnp.mean(out ** 2)

    l_tp, g_tp = jax.value_and_grad(loss_tp)(stacked, x, y)
    l_sq, g_sq = jax.value_and_grad(loss_seq)(stacked, x, y)
    np.testing.assert_allclose(float(l_tp), float(l_sq), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-4
        ),
        g_tp, g_sq,
    )


def test_tp_trunk_rejects_indivisible():
    mesh = mesh_lib.make_mesh(data=1, model=8)
    x, c, rope, stacked, _ = _setup()
    with pytest.raises(ValueError, match="divisible"):
        # heads=4 cannot split over 8 devices
        tensor_parallel_trunk(stacked, x, c, rope, mesh=mesh,
                              num_heads=HEADS, dtype=jnp.float32)
