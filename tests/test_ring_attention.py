"""Ring attention (parallel/ring_attention.py) vs full softmax attention.

Context parallelism has no reference counterpart (SURVEY §5: no SP/CP
upstream), so the bar is internal: sequence-sharded ring attention must
reproduce the dense attention forward and gradients on the virtual mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deco_tpu.parallel import mesh as mesh_lib
from deco_tpu.parallel.ring_attention import ring_attention


def _dense(q, k, v):
    scale = 1.0 / (q.shape[-1] ** 0.5)
    s = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum(
        "bhqk,bkhd->bqhd", p.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)


def _qkv(dtype=jnp.float32, b=4, n=32, h=4, d=16):
    rng = np.random.RandomState(0)
    mk = lambda s: jnp.asarray(rng.randn(b, n, h, d), dtype)
    return mk(0), mk(1), mk(2)


@pytest.mark.parametrize("data,ring", [(2, 4), (1, 8), (4, 2)])
def test_ring_matches_dense_forward(data, ring):
    mesh = mesh_lib.make_mesh(data=data, model=ring)
    q, k, v = _qkv()
    out = ring_attention(q, k, v, mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_dense(q, k, v)), atol=1e-5
    )


def test_ring_gradients_match_dense():
    mesh = mesh_lib.make_mesh(data=2, model=4)
    q, k, v = _qkv()

    @jax.jit
    def loss_ring(q, k, v):
        return jnp.mean(ring_attention(q, k, v, mesh=mesh) ** 2)

    def loss_dense(q, k, v):
        return jnp.mean(_dense(q, k, v) ** 2)

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_dense = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_ring, g_dense, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, err_msg=f"d{name}"
        )


def test_ring_bf16_smoke():
    """bf16 inputs (the production dtype) stay finite and close to dense."""
    mesh = mesh_lib.make_mesh(data=2, model=4)
    q, k, v = _qkv(jnp.bfloat16)
    out = ring_attention(q, k, v, mesh=mesh)
    ref = _dense(q, k, v)
    assert jnp.isfinite(out.astype(jnp.float32)).all()
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2
    )
