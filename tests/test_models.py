"""Model shape/dtype/init tests for the DeCo family (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deco_tpu.models import layers
from deco_tpu.models.dit_c2i_baseline import BaselineDiT
from deco_tpu.models.dit_c2i_deco import DeCoC2I
from deco_tpu.models.dit_c2i_pixnerd import PixNerdC2I
from deco_tpu.models.dit_t2i import DeCoT2I, PixNerdT2I
from deco_tpu.models.patching import patchify, unpatchify


class TestPatching:
    def test_roundtrip(self):
        x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 48, 3), jnp.float32)
        p = patchify(x, 16)
        assert p.shape == (2, 2 * 3, 16 * 16 * 3)
        back = unpatchify(p, 2, 3, 16)
        np.testing.assert_allclose(back, x)

    def test_pixel_major_layout(self):
        """Patch flat axis is (pixel_row, pixel_col, channel)."""
        x = jnp.arange(2 * 2 * 3, dtype=jnp.float32).reshape(1, 2, 2, 3)
        p = patchify(x, 2)
        np.testing.assert_allclose(p[0, 0], x.reshape(-1))

    def test_non_divisible_size_raises_clearly(self):
        x = jnp.zeros((1, 30, 32, 3), jnp.float32)
        with pytest.raises(ValueError, match="not divisible by patch_size"):
            patchify(x, 16)


class TestLayers:
    def test_rmsnorm_fp32_islands(self):
        m = layers.RMSNorm()
        x = jnp.asarray(np.random.RandomState(0).randn(2, 8), jnp.bfloat16)
        params = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(params, x)
        assert out.dtype == jnp.bfloat16
        assert params["params"]["weight"].dtype == jnp.float32
        # unit-norm rows after weight=1
        xf = np.asarray(x, np.float32)
        expected = xf / np.sqrt((xf**2).mean(-1, keepdims=True) + 1e-6)
        np.testing.assert_allclose(np.asarray(out, np.float32), expected, atol=1e-2)

    def test_timestep_embedder_max_period_quirk(self):
        """DeCo family uses max_period=10 (time_embed.py:16)."""
        m = layers.TimestepEmbedder(32, frequency_embedding_size=8)
        emb = m.timestep_embedding(jnp.asarray([0.5]), 8)
        freqs = np.exp(-np.log(10.0) * np.arange(4) / 4)
        expected = np.concatenate([np.cos(0.5 * freqs), np.sin(0.5 * freqs)])
        np.testing.assert_allclose(emb[0], expected, atol=1e-6)

    def test_rope_rotation_preserves_norm(self):
        cos, sin = layers.precompute_rope_2d(64, 4, 4)
        assert cos.shape == (16, 32)
        q = jnp.asarray(np.random.RandomState(0).randn(2, 16, 3, 64), jnp.float32)
        k = jnp.asarray(np.random.RandomState(1).randn(2, 16, 3, 64), jnp.float32)
        q2, k2 = layers.apply_rope(q, k, (cos, sin))
        np.testing.assert_allclose(
            np.linalg.norm(q2, axis=-1), np.linalg.norm(q, axis=-1), rtol=1e-5
        )

    def test_rope_matches_complex_formulation(self):
        """cos/sin path == complex multiply (reference rope.py:49-60)."""
        dim, h, w = 8, 2, 3
        cos, sin = layers.precompute_rope_2d(dim, h, w)
        rng = np.random.RandomState(2)
        q = rng.randn(1, h * w, 1, dim).astype(np.float32)
        qc = q.reshape(1, h * w, 1, dim // 2, 2)
        qc = qc[..., 0] + 1j * qc[..., 1]
        cis = np.asarray(cos) + 1j * np.asarray(sin)  # (N, dim/2)
        out_c = qc * cis[None, :, None, :]
        expected = np.stack([out_c.real, out_c.imag], -1).reshape(q.shape)
        got, _ = layers.apply_rope(jnp.asarray(q), jnp.asarray(q), (cos, sin))
        np.testing.assert_allclose(got, expected, atol=1e-5)

    def test_nerf_dct_basis(self):
        basis = layers.nerf_dct_basis(4, 8)
        assert basis.shape == (16, 64)
        # zero-frequency component is constant 1 across pixels
        np.testing.assert_allclose(basis[:, 0], np.ones(16))

    def test_sdpa_matches_naive(self):
        rng = np.random.RandomState(3)
        q = jnp.asarray(rng.randn(2, 5, 2, 8), jnp.float32)
        k = jnp.asarray(rng.randn(2, 5, 2, 8), jnp.float32)
        v = jnp.asarray(rng.randn(2, 5, 2, 8), jnp.float32)
        out = layers.sdpa(q, k, v, dtype=jnp.float32)
        logits = np.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(8)
        probs = np.exp(logits - logits.max(-1, keepdims=True))
        probs /= probs.sum(-1, keepdims=True)
        expected = np.einsum("bhqk,bkhd->bqhd", probs, v)
        np.testing.assert_allclose(out, expected, atol=1e-5)


def _tiny_deco(**kw):
    cfg = dict(
        in_channels=3, patch_size=4, num_groups=2, hidden_size=32, hidden_size_x=8,
        num_blocks=4, num_cond_blocks=2, num_classes=10,
    )
    cfg.update(kw)
    return DeCoC2I(**cfg)


class TestDeCoC2I:
    def test_forward_shapes(self):
        model = _tiny_deco()
        x = jnp.zeros((2, 16, 16, 3))
        t = jnp.asarray([0.1, 0.9])
        y = jnp.asarray([1, 2])
        params = model.init(jax.random.PRNGKey(0), x, t, y)
        out = model.apply(params, x, t, y)
        assert out.shape == (2, 16, 16, 3)
        assert out.dtype == jnp.float32

    def test_zero_init_output(self):
        """dec_net final layer zero-init -> output 0 at init."""
        model = _tiny_deco()
        x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 16, 3), jnp.float32)
        t = jnp.asarray([0.3, 0.7])
        y = jnp.asarray([0, 1])
        params = model.init(jax.random.PRNGKey(0), x, t, y)
        out = model.apply(params, x, t, y)
        np.testing.assert_allclose(out, np.zeros_like(out), atol=1e-6)

    def test_scanned_blocks_param_stacking(self):
        model = _tiny_deco()
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)), jnp.zeros((1,)),
            jnp.zeros((1,), jnp.int32),
        )
        qkv = params["params"]["blocks"]["block"]["attn"]["qkv"]["kernel"]
        assert qkv.shape == (2, 32, 96)  # (num_cond_blocks, in, out)

    def test_feature_tap(self):
        model = _tiny_deco(align_layer=1)
        x = jnp.asarray(np.random.RandomState(0).randn(1, 16, 16, 3), jnp.float32)
        t, y = jnp.asarray([0.5]), jnp.asarray([3])
        params = model.init(jax.random.PRNGKey(0), x, t, y)
        out, feat = model.apply(params, x, t, y, return_features=True)
        assert feat.shape == (1, 16, 32)  # (B, L, hidden)
        assert np.abs(np.asarray(feat, np.float32)).sum() > 0

    def test_resolution_generalization(self):
        """Same params work at a different resolution (RoPE rescale)."""
        model = _tiny_deco()
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)), jnp.zeros((1,)),
            jnp.zeros((1,), jnp.int32),
        )
        out = model.apply(
            params, jnp.zeros((1, 32, 32, 3)), jnp.zeros((1,)),
            jnp.zeros((1,), jnp.int32),
        )
        assert out.shape == (1, 32, 32, 3)

    def test_grad_checkpoint_equivalent(self):
        m1 = _tiny_deco()
        m2 = _tiny_deco(grad_checkpoint=True)
        x = jnp.asarray(np.random.RandomState(0).randn(1, 16, 16, 3), jnp.float32)
        t, y = jnp.asarray([0.5]), jnp.asarray([3])
        params = m1.init(jax.random.PRNGKey(0), x, t, y)
        np.testing.assert_allclose(
            m1.apply(params, x, t, y), m2.apply(params, x, t, y), atol=1e-6
        )

    def test_attn_remat_policy_equivalent(self):
        """Selective remat ("attn": save attention out + flash lse via
        checkpoint_name tags, recompute everything else) matches full remat
        gradients exactly."""
        m1 = _tiny_deco()
        m2 = _tiny_deco(grad_checkpoint=True, trunk_remat_policy="attn")
        x = jnp.asarray(
            np.random.RandomState(2).randn(2, 16, 16, 3), jnp.float32)
        t, y = jnp.asarray([0.5, 0.2]), jnp.asarray([3, 1])
        params = m1.init(jax.random.PRNGKey(0), x, t, y)
        g1 = jax.grad(lambda p: jnp.sum(m1.apply(p, x, t, y) ** 2))(params)
        g2 = jax.grad(lambda p: jnp.sum(m2.apply(p, x, t, y) ** 2))(params)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4,
                                                    atol=1e-6), g1, g2)

    def test_decoder_chunks_equivalent(self):
        """Chunked pixel decoder (scan over L-chunks, the 512px HBM-peak fix)
        matches unchunked bit-for-bit in forward AND gradients, off the SAME
        param tree (paths unchanged => checkpoints interchangeable)."""
        m1 = _tiny_deco()
        m2 = _tiny_deco(decoder_chunks=4, grad_checkpoint=True)
        x = jnp.asarray(
            np.random.RandomState(1).randn(2, 16, 16, 3), jnp.float32)
        t, y = jnp.asarray([0.5, 0.2]), jnp.asarray([3, 1])
        params = m1.init(jax.random.PRNGKey(0), x, t, y)
        # init through the chunked path builds the identical tree
        params2 = m2.init(jax.random.PRNGKey(0), x, t, y)
        assert jax.tree_util.tree_structure(params) == \
            jax.tree_util.tree_structure(params2)
        np.testing.assert_allclose(
            m1.apply(params, x, t, y), m2.apply(params, x, t, y), atol=1e-6
        )
        g1 = jax.grad(lambda p: jnp.sum(m1.apply(p, x, t, y) ** 2))(params)
        g2 = jax.grad(lambda p: jnp.sum(m2.apply(p, x, t, y) ** 2))(params)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4,
                                                    atol=1e-6), g1, g2)


def test_t2i_decoder_chunks_equivalent():
    """DeCoT2I.decoder_chunks: same contract as the c2i knob — chunked
    pixel decoder matches unchunked fwd+grad off the SAME param tree."""
    from deco_tpu.models.dit_t2i import DeCoT2I

    kw = dict(in_channels=3, patch_size=4, num_groups=2, hidden_size=32,
              decoder_hidden_size=8, num_encoder_blocks=1,
              num_decoder_blocks=1, num_text_blocks=1, txt_embed_dim=16,
              txt_max_length=4, dtype=jnp.float32)
    m1 = DeCoT2I(**kw)
    m2 = DeCoT2I(**kw, decoder_chunks=4, grad_checkpoint=True)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 16, 16, 3), jnp.float32)
    t = jnp.asarray([0.5, 0.2])
    y = jnp.asarray(rng.randn(2, 4, 16), jnp.float32)
    params = m1.init(jax.random.PRNGKey(0), x, t, y)
    params2 = m2.init(jax.random.PRNGKey(0), x, t, y)
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(params2)
    np.testing.assert_allclose(
        m1.apply(params, x, t, y), m2.apply(params, x, t, y), atol=1e-6
    )
    g1 = jax.grad(lambda p: jnp.sum(m1.apply(p, x, t, y) ** 2))(params)
    g2 = jax.grad(lambda p: jnp.sum(m2.apply(p, x, t, y) ** 2))(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4,
                                                atol=1e-6), g1, g2)


class TestOtherModels:
    def test_baseline_dit(self):
        model = BaselineDiT(
            in_channels=3, patch_size=4, num_groups=2, hidden_size=32,
            num_blocks=2, num_classes=10,
        )
        x = jnp.zeros((2, 16, 16, 3))
        params = model.init(
            jax.random.PRNGKey(0), x, jnp.zeros((2,)), jnp.zeros((2,), jnp.int32)
        )
        out = model.apply(params, x, jnp.zeros((2,)), jnp.zeros((2,), jnp.int32))
        assert out.shape == (2, 16, 16, 3)

    def test_pixnerd_c2i(self):
        model = PixNerdC2I(
            in_channels=3, patch_size=4, num_groups=2, hidden_size=32,
            hidden_size_x=8, nerf_mlpratio=2, num_blocks=4, num_cond_blocks=2,
            num_classes=10,
        )
        x = jnp.zeros((2, 16, 16, 3))
        params = model.init(
            jax.random.PRNGKey(0), x, jnp.zeros((2,)), jnp.zeros((2,), jnp.int32)
        )
        out = model.apply(params, x, jnp.zeros((2,)), jnp.zeros((2,), jnp.int32))
        assert out.shape == (2, 16, 16, 3)

    @pytest.mark.parametrize("cls", [DeCoT2I, PixNerdT2I])
    def test_t2i_models(self, cls):
        model = cls(
            in_channels=3, patch_size=4, num_groups=2, hidden_size=32,
            decoder_hidden_size=8, num_encoder_blocks=2, num_decoder_blocks=2,
            num_text_blocks=1, txt_embed_dim=16, txt_max_length=6,
        )
        x = jnp.zeros((2, 16, 16, 3))
        t = jnp.zeros((2,))
        y = jnp.zeros((2, 6, 16))  # (B, txt_len, txt_embed_dim)
        params = model.init(jax.random.PRNGKey(0), x, t, y)
        out = model.apply(params, x, t, y)
        assert out.shape == (2, 16, 16, 3)
