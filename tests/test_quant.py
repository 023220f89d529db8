"""W8A8 int8 trunk serving mode (ops/quant.py, models/layers.Int8Dense).

The reference has no quantized path (everything runs bf16 autocast,
src/diffusion/base/sampling.py:27); this is a TPU-native extension: v5e's MXU
executes int8 at 2x the bf16 rate, measured +3.2% end-to-end on the 50-step
sampling headline (bench.py, DECO_QUANT=int8: 4.638 vs 4.494 img/s/chip).
Opt-in only -- golden-parity tests pin the exact bf16/fp32 path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deco_tpu.models.dit_c2i_deco import DeCoC2I
from deco_tpu.ops import quant


TINY = dict(in_channels=3, patch_size=4, num_groups=4, hidden_size=64,
            hidden_size_x=16, num_blocks=6, num_cond_blocks=3, num_classes=10)


def _randomized(params, key, scale=0.2):
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(key, len(leaves))
    return treedef.unflatten(
        [p + scale * jax.random.normal(k, p.shape) for p, k in zip(leaves, keys)]
    )


def _inputs():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    return x, jnp.array([0.3, 0.7]), jnp.array([1, 2])


class TestQuantOps:
    def test_int8_matmul_approximates(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        x = jax.random.normal(k1, (32, 48))
        w = jax.random.normal(k2, (48, 24)) * 0.05
        y = quant.int8_matmul(x, w)
        ref = x @ w
        # per-row/per-channel symmetric int8: ~1% relative error budget
        assert float(jnp.max(jnp.abs(y - ref))) < 0.02 * float(jnp.max(jnp.abs(ref)))

    def test_prequant_matches_fly(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(3))
        x = jax.random.normal(k1, (8, 16))
        w = jax.random.normal(k2, (16, 12))
        wq, ws = quant.quantize_weight(w)
        np.testing.assert_array_equal(
            quant.int8_matmul_prequant(x, wq, ws), quant.int8_matmul(x, w)
        )

    def test_zero_rows_safe(self):
        w = jax.random.normal(jax.random.PRNGKey(4), (16, 12))
        y = quant.int8_matmul(jnp.zeros((4, 16)), w)
        assert not np.any(np.isnan(np.asarray(y)))
        np.testing.assert_allclose(np.asarray(y), 0.0)


class TestQuantizedTrunk:
    def test_param_tree_identical_and_quant_stacked(self):
        x, t, y = _inputs()
        v_exact = DeCoC2I(**TINY).init(jax.random.PRNGKey(0), x, t, y)
        v_int8 = DeCoC2I(**TINY, quantize="int8").init(jax.random.PRNGKey(0), x, t, y)
        # checkpoints are layout-identical across modes
        assert jax.tree.structure(v_exact["params"]) == jax.tree.structure(
            v_int8["params"]
        )
        assert "quant" in v_int8 and "quant" not in v_exact
        # quant kernels are stacked along the scanned block axis, int8 + f32
        q = v_int8["quant"]["blocks"]["block"]["attn"]["qkv"]["kernel_q"]
        assert q[0].dtype == jnp.int8 and q[0].shape[0] == TINY["num_cond_blocks"]
        assert q[1].dtype == jnp.float32

    def test_cached_equals_fly_and_approximates_exact(self):
        x, t, y = _inputs()
        m_exact = DeCoC2I(**TINY)
        m_int8 = DeCoC2I(**TINY, quantize="int8")
        v = m_int8.init(jax.random.PRNGKey(0), x, t, y)
        params = _randomized(v["params"], jax.random.PRNGKey(2))

        out_exact = m_exact.apply({"params": params}, x, t, y)
        out_fly = m_int8.apply({"params": params}, x, t, y)
        # populate the cache from the live params, then reuse it
        _, qvars = m_int8.apply({"params": params}, x, t, y, mutable="quant")
        out_cached = m_int8.apply(
            {"params": params, "quant": qvars["quant"]}, x, t, y
        )
        np.testing.assert_array_equal(
            np.asarray(out_cached), np.asarray(out_fly)
        )
        mx = float(jnp.max(jnp.abs(out_exact)))
        rel = float(jnp.max(jnp.abs(out_cached - out_exact))) / mx
        # 0.2-scale random weights are the quantization worst case; trained
        # weights land far tighter. This pins "close but not exact".
        assert 0 < rel < 0.5

    def test_env_override_activates(self, monkeypatch):
        x, t, y = _inputs()
        monkeypatch.setenv("DECO_QUANT", "int8")
        v = DeCoC2I(**TINY).init(jax.random.PRNGKey(0), x, t, y)
        assert "quant" in v

    def test_bad_mode_raises(self):
        x, t, y = _inputs()
        with pytest.raises(ValueError, match="quantize"):
            DeCoC2I(**TINY, quantize="fp4").init(jax.random.PRNGKey(0), x, t, y)

    @pytest.mark.parametrize("cls_name", ["DeCoT2I", "PixNerdT2I"])
    def test_t2i_family(self, cls_name):
        from deco_tpu.models import dit_t2i

        cls = getattr(dit_t2i, cls_name)
        kw = dict(in_channels=3, patch_size=4, num_groups=4, hidden_size=64,
                  decoder_hidden_size=16, num_encoder_blocks=3,
                  num_decoder_blocks=2, num_text_blocks=2, txt_embed_dim=32,
                  txt_max_length=8)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
        t = jnp.array([0.3, 0.7])
        y = jax.random.normal(jax.random.PRNGKey(4), (2, 8, 32))
        m = cls(**kw)
        m8 = cls(**kw, quantize="int8")
        v = m8.init(jax.random.PRNGKey(0), x, t, y)
        assert "quant" in v
        assert jax.tree.structure(
            m.init(jax.random.PRNGKey(0), x, t, y)["params"]
        ) == jax.tree.structure(v["params"])
        params = _randomized(v["params"], jax.random.PRNGKey(2))
        out_exact = m.apply({"params": params}, x, t, y)
        out_fly = m8.apply({"params": params}, x, t, y)
        _, qvars = m8.apply({"params": params}, x, t, y, mutable="quant")
        out_cached = m8.apply({"params": params, "quant": qvars["quant"]}, x, t, y)
        np.testing.assert_array_equal(np.asarray(out_cached), np.asarray(out_fly))
        rel = float(jnp.max(jnp.abs(out_cached - out_exact))) / float(
            jnp.max(jnp.abs(out_exact))
        )
        assert 0 < rel < 0.5

    def test_int8_under_trunk_parallel_raises(self):
        x, t, y = _inputs()
        m = DeCoC2I(**TINY, quantize="int8", trunk_parallel="tp")
        v_seq = DeCoC2I(**TINY, quantize="int8").init(jax.random.PRNGKey(0), x, t, y)
        with pytest.raises(ValueError, match="trunk_parallel"):
            m.apply({"params": v_seq["params"]}, x, t, y)

    def test_fused_swiglu_matches_unfused(self, monkeypatch):
        x, t, y = _inputs()
        m = DeCoC2I(**TINY)
        v = m.init(jax.random.PRNGKey(0), x, t, y)
        params = _randomized(v["params"], jax.random.PRNGKey(2))
        out_ref = m.apply({"params": params}, x, t, y)
        monkeypatch.setenv("DECO_SWIGLU_FUSED", "1")
        out_fused = m.apply({"params": params}, x, t, y)
        # same math, different GEMM tiling: tight-but-not-bitwise tolerance
        mx = float(jnp.max(jnp.abs(out_ref)))
        assert float(jnp.max(jnp.abs(out_fused - out_ref))) < 1e-2 * mx
