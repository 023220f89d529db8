"""MoE MLP (models/moe.py) + expert parallelism (parallel/ep_moe.py).

The dense module is the spec; the EP executor must reproduce it EXACTLY —
same outputs, same gradients, same aux loss, same capacity drops — with
experts sharded over the model axis and tokens over (data, model). No
reference counterpart (hhhhzp/DeCo is dense-only); the bar is internal
bit-consistency, like test_sp_trunk/test_tp_trunk.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deco_tpu.models.moe import MoEMLP
from deco_tpu.parallel import mesh as mesh_lib
from deco_tpu.parallel.ep_moe import expert_parallel_moe

B, S, D, E, M = 4, 64, 32, 8, 64


def _setup(capacity_factor=1.25, top_k=2):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, S, D), jnp.float32)
    mod = MoEMLP(num_experts=E, mlp_dim=M, top_k=top_k,
                 capacity_factor=capacity_factor, dtype=jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x)["params"]
    cap = int(-(-capacity_factor * S * top_k // E))
    return mod, params, x, cap


def _dense(mod, params, x):
    y, aux_vars = mod.apply({"params": params}, x, mutable=["aux_loss"])
    return y, aux_vars["aux_loss"]["moe"][0]


def test_dense_shapes_and_capacity_drops():
    mod, params, x, _ = _setup()
    y, aux = _dense(mod, params, x)
    assert y.shape == x.shape and np.isfinite(np.asarray(y)).all()
    assert float(aux) > 0
    # tight capacity must change the output (tokens get dropped)
    tight, tparams, _, _ = _setup(capacity_factor=0.25)
    y2, _ = _dense(tight, params, x)
    assert float(jnp.abs(y - y2).max()) > 1e-6


@pytest.mark.parametrize("data,model", [(2, 4), (1, 8)])
@pytest.mark.parametrize("capacity_factor", [1.25, 0.5])
def test_ep_matches_dense(data, model, capacity_factor):
    """Forward + aux exact across geometries, incl. tight-capacity drops
    (0.5 exercises the cross-shard slot-offset path hard)."""
    mod, params, x, cap = _setup(capacity_factor=capacity_factor)
    y_ref, aux_ref = _dense(mod, params, x)
    mesh = mesh_lib.make_mesh(data=data, model=model)
    y, aux = expert_parallel_moe(
        params, x, top_k=2, capacity=cap, mesh=mesh, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-5)
    np.testing.assert_allclose(float(aux), float(aux_ref), rtol=1e-5)


def test_ep_grads_match_dense():
    mod, params, x, cap = _setup()
    mesh = mesh_lib.make_mesh(data=2, model=4)

    def loss_dense(p):
        y, aux = _dense(mod, p, x)
        return jnp.sum(y ** 2) + 0.01 * aux

    def loss_ep(p):
        y, aux = expert_parallel_moe(
            p, x, top_k=2, capacity=cap, mesh=mesh, dtype=jnp.float32)
        return jnp.sum(y ** 2) + 0.01 * aux

    g_ref = jax.jit(jax.grad(loss_dense))(params)
    g = jax.jit(jax.grad(loss_ep))(params)
    err = max(jax.tree.leaves(
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), g, g_ref)))
    assert err < 1e-4, f"EP grad mismatch {err}"


def test_ep_ambient_mesh_and_jit():
    mod, params, x, cap = _setup()
    y_ref, _ = _dense(mod, params, x)
    mesh = mesh_lib.make_mesh(data=2, model=4)
    with jax.set_mesh(mesh):
        y, _ = jax.jit(
            lambda p, xx: expert_parallel_moe(
                p, xx, top_k=2, capacity=cap, dtype=jnp.float32)
        )(params, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-5)
