"""Pallas op tests (interpreter mode on CPU): flash attention vs XLA SDPA,
fused frequency-MSE kernel vs the XLA path."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from deco_tpu.models.layers import sdpa
from deco_tpu.ops import block_dct
from deco_tpu.ops.flash_attention import flash_attention


class TestFlashAttention:
    @pytest.mark.parametrize("n,d,h", [(64, 32, 2), (128, 72, 4)])
    def test_matches_sdpa(self, n, d, h):
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(2, n, h, d), jnp.float32)
        k = jnp.asarray(rng.randn(2, n, h, d), jnp.float32)
        v = jnp.asarray(rng.randn(2, n, h, d), jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            out = flash_attention(q, k, v)
        ref = sdpa(q, k, v, dtype=jnp.float32)
        np.testing.assert_allclose(out, ref, atol=2e-5)

    def test_cross_attention_shapes(self):
        """Nq != Nkv (the t2i joint-attention case)."""
        rng = np.random.RandomState(1)
        q = jnp.asarray(rng.randn(1, 64, 2, 32), jnp.float32)
        k = jnp.asarray(rng.randn(1, 96, 2, 32), jnp.float32)
        v = jnp.asarray(rng.randn(1, 96, 2, 32), jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            out = flash_attention(q, k, v)
        ref = sdpa(q, k, v, dtype=jnp.float32)
        np.testing.assert_allclose(out, ref, atol=2e-5)

    def test_gradients_match_sdpa(self):
        rng = np.random.RandomState(2)
        q = jnp.asarray(rng.randn(1, 32, 2, 16), jnp.float32)
        k = jnp.asarray(rng.randn(1, 32, 2, 16), jnp.float32)
        v = jnp.asarray(rng.randn(1, 32, 2, 16), jnp.float32)

        def loss_flash(q, k, v):
            with pltpu.force_tpu_interpret_mode():
                return jnp.sum(flash_attention(q, k, v) ** 2)

        def loss_ref(q, k, v):
            return jnp.sum(sdpa(q, k, v, dtype=jnp.float32) ** 2)

        g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(a, b, atol=1e-4)

    def test_pallas_backward_kernel_matches_xla_backward(self, monkeypatch):
        """The fused Pallas bwd (dq + dkv kernels, VERDICT round-1 item 6)
        is gradient-exact against the O(N^2)-materializing XLA backward."""
        rng = np.random.RandomState(7)
        # head_dim 72 exercises the 128-lane pad path like DeCo-XL
        q = jnp.asarray(rng.randn(2, 128, 2, 72), jnp.float32)
        k = jnp.asarray(rng.randn(2, 128, 2, 72), jnp.float32)
        v = jnp.asarray(rng.randn(2, 128, 2, 72), jnp.float32)

        def loss(q, k, v):
            return jnp.sum(flash_attention(q, k, v) ** 2)

        monkeypatch.setenv("DECO_FLASH_BWD", "pallas")
        with pltpu.force_tpu_interpret_mode():
            g_pallas = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        monkeypatch.setenv("DECO_FLASH_BWD", "xla")
        with pltpu.force_tpu_interpret_mode():
            g_xla = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g_pallas, g_xla):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)

    def test_bf16_path(self):
        rng = np.random.RandomState(3)
        q = jnp.asarray(rng.randn(1, 64, 2, 32), jnp.bfloat16)
        k = jnp.asarray(rng.randn(1, 64, 2, 32), jnp.bfloat16)
        v = jnp.asarray(rng.randn(1, 64, 2, 32), jnp.bfloat16)
        with pltpu.force_tpu_interpret_mode():
            out = flash_attention(q, k, v)
        assert out.dtype == jnp.bfloat16
        ref = sdpa(q, k, v, dtype=jnp.bfloat16)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2
        )


class TestFlashStreaming:
    """The long-sequence streaming kernels (KV/Q axis in the grid, fp32 VMEM
    scratch accumulators) must be equivalent to the resident kernels they
    replace past the VMEM budget. Measured trigger: 16,384 tokens blows the
    ~16MB scoped VMEM limit with the resident layout (2048px sampling)."""

    def _qkv(self, n_q=640, n_kv=640, h=2, d=72):
        # 640 tokens -> _pick_blocks gives 128-wide blocks -> FIVE inner
        # grid steps: the cross-block scratch carry (m/l rescaling, the
        # init/finalize @pl.when split) actually executes at j>0. Smaller
        # shapes collapse to a single block and never test the recurrence.
        rng = np.random.RandomState(11)
        q = jnp.asarray(rng.randn(1, n_q, h, d), jnp.float32)
        k = jnp.asarray(rng.randn(1, n_kv, h, d), jnp.float32)
        v = jnp.asarray(rng.randn(1, n_kv, h, d), jnp.float32)
        return q, k, v

    def test_streaming_forward_matches_resident(self, monkeypatch):
        from deco_tpu.ops import flash_attention as fa

        q, k, v = self._qkv()
        with pltpu.force_tpu_interpret_mode():
            o_res = flash_attention(q, k, v)
        monkeypatch.setattr(fa, "_RESIDENT_VMEM_BUDGET", 1)
        with pltpu.force_tpu_interpret_mode():
            o_str = flash_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(o_str), np.asarray(o_res),
                                   atol=1e-6)

    def test_streaming_backward_matches_resident(self, monkeypatch):
        from deco_tpu.ops import flash_attention as fa

        q, k, v = self._qkv()

        def loss(q, k, v):
            return jnp.sum(flash_attention(q, k, v) ** 2)

        monkeypatch.setenv("DECO_FLASH_BWD", "pallas")
        with pltpu.force_tpu_interpret_mode():
            g_res = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        monkeypatch.setattr(fa, "_RESIDENT_VMEM_BUDGET", 1)
        with pltpu.force_tpu_interpret_mode():
            g_str = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g_str, g_res):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)


class TestFreqMSEPallas:
    def test_matches_xla(self):
        rng = np.random.RandomState(4)
        diff = jnp.asarray(rng.randn(2, 16, 24, 3), jnp.float32)
        w = block_dct.build_freq_weight()
        with pltpu.force_tpu_interpret_mode():
            got = block_dct.frequency_weighted_mse_pallas(diff, w)
        want = block_dct.frequency_weighted_mse_xla(diff, w)
        np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_wide_strips_tile_over_w(self):
        """w > 1024 activates the W-tiled grid (the 2048px training path);
        the accumulator-init guard must only fire at (0, 0) — a wrong guard
        would reset the partial sum every strip and pass the narrow test."""
        rng = np.random.RandomState(6)
        diff = jnp.asarray(rng.randn(1, 16, 2048, 3), jnp.float32)
        w = block_dct.build_freq_weight()
        with pltpu.force_tpu_interpret_mode():
            got = block_dct.frequency_weighted_mse_pallas(diff, w)
        want = block_dct.frequency_weighted_mse_xla(diff, w)
        np.testing.assert_allclose(got, want, rtol=1e-4)

    def test_production_entrypoint_dispatches_pallas(self, monkeypatch):
        """frequency_weighted_mse (the loss call site) must give identical
        value AND gradient whichever implementation the dispatcher picks."""
        rng = np.random.RandomState(5)
        diff = jnp.asarray(rng.randn(2, 16, 16, 3), jnp.float32)
        w = block_dct.build_freq_weight()

        monkeypatch.setenv("DECO_FREQ_MSE_IMPL", "pallas")
        with pltpu.force_tpu_interpret_mode():
            val_p = block_dct.frequency_weighted_mse(diff, w)
            grad_p = jax.grad(
                lambda d: block_dct.frequency_weighted_mse(d, w)
            )(diff)

        monkeypatch.setenv("DECO_FREQ_MSE_IMPL", "xla")
        val_x = block_dct.frequency_weighted_mse(diff, w)
        grad_x = jax.grad(lambda d: block_dct.frequency_weighted_mse(d, w))(diff)

        np.testing.assert_allclose(val_p, val_x, rtol=1e-4)
        np.testing.assert_allclose(grad_p, grad_x, rtol=1e-3, atol=1e-6)


class TestFlashRaggedFallback:
    def test_sublane_indivisible_sequences_fall_back(self):
        """Sequences not divisible by 8 (e.g. a ViT probe with 5 tokens)
        can't lower to the Mosaic kernel; flash_attention must route them
        to XLA with identical results (caught by the VAE-GAN TPU smoke)."""
        from deco_tpu.ops.flash_attention import flash_attention

        q = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 4, 8))
        k = jax.random.normal(jax.random.PRNGKey(1), (2, 13, 4, 8))
        v = jax.random.normal(jax.random.PRNGKey(2), (2, 13, 4, 8))
        out = flash_attention(q, k, v)
        ref = jax.nn.dot_product_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-6)
