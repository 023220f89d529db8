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


class TestQuantCacheSafety:
    """Round-4 advisor findings: the int8 cache is only valid for the params
    it was quantized from; training must refuse the inference-only mode."""

    def test_env_bad_mode_raises(self, monkeypatch):
        monkeypatch.setenv("DECO_QUANT", "int4")
        with pytest.raises(ValueError, match="DECO_QUANT"):
            quant.env_quant_mode()
        monkeypatch.setenv("DECO_QUANT", "INT8")  # typo'd case
        with pytest.raises(ValueError, match="DECO_QUANT"):
            quant.env_quant_mode()
        monkeypatch.setenv("DECO_QUANT", "")
        assert quant.env_quant_mode() is None
        monkeypatch.delenv("DECO_QUANT")
        assert quant.env_quant_mode() is None

    def test_verify_detects_stale_cache(self):
        from deco_tpu.models.layers import (StaleQuantCacheError,
                                            verify_quant_cache)

        x, t, y = _inputs()
        m8 = DeCoC2I(**TINY, quantize="int8")
        v = m8.init(jax.random.PRNGKey(0), x, t, y)
        params_a = _randomized(v["params"], jax.random.PRNGKey(2))
        params_b = _randomized(v["params"], jax.random.PRNGKey(3))
        _, qvars = m8.apply({"params": params_a}, x, t, y, mutable="quant")
        # fresh cache verifies
        verify_quant_cache({"params": params_a, "quant": qvars["quant"]})
        # the reproduced advisor scenario: cache from A served with B
        with pytest.raises(StaleQuantCacheError, match="fingerprint"):
            verify_quant_cache({"params": params_b, "quant": qvars["quant"]})
        # no quant collection: no-op
        verify_quant_cache({"params": params_b})

    def test_refresh_quant_cache_matches_mutable_apply(self):
        x, t, y = _inputs()
        m8 = DeCoC2I(**TINY, quantize="int8")
        v = m8.init(jax.random.PRNGKey(0), x, t, y)
        params = _randomized(v["params"], jax.random.PRNGKey(2))
        fresh = quant.refresh_quant_cache(m8, {"params": params}, x, t, y)
        _, qvars = m8.apply({"params": params}, x, t, y, mutable="quant")
        ja, jb = jax.tree.leaves(fresh["quant"]), jax.tree.leaves(qvars["quant"])
        assert len(ja) == len(jb)
        for a, b in zip(ja, jb):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        out = m8.apply(fresh, x, t, y)
        assert np.all(np.isfinite(np.asarray(out, np.float32)))

    def test_pipeline_ctor_rejects_stale_cache(self):
        from deco_tpu.models.autoencoders import PixelAE
        from deco_tpu.models.conditioners import Qwen3TextEncoder
        from deco_tpu.models.dit_t2i import DeCoT2I
        from deco_tpu.models.layers import StaleQuantCacheError
        from deco_tpu.serve import Pipeline

        kw = dict(in_channels=3, patch_size=4, num_groups=2, hidden_size=32,
                  decoder_hidden_size=8, num_encoder_blocks=2,
                  num_decoder_blocks=1, num_text_blocks=1, txt_embed_dim=16,
                  txt_max_length=6)
        m8 = DeCoT2I(**kw, quantize="int8")
        conditioner = Qwen3TextEncoder(weight_path=None, embed_dim=16,
                                       max_length=6)
        cond, _ = conditioner(["warmup"])
        x = jnp.zeros((1, 32, 32, 3))
        t = jnp.zeros((1,))
        v = m8.init(jax.random.PRNGKey(0), x, t, cond[:1])
        restored = _randomized(v["params"], jax.random.PRNGKey(7))
        # serving restored params with the init-time cache must fail loudly
        with pytest.raises(StaleQuantCacheError):
            Pipeline(PixelAE(), m8, conditioner,
                     {"params": restored, "quant": v["quant"]},
                     base_resolution=32)
        # a refreshed cache is accepted
        ok = quant.refresh_quant_cache(m8, {"params": restored}, x, t, cond[:1])
        Pipeline(PixelAE(), m8, conditioner, ok, base_resolution=32)

    def test_experiment_fit_context_raises(self, tmp_path, monkeypatch):
        """DECO_QUANT=int8 + Experiment.init_state (the fit path) must raise:
        the trunk would silently receive zero gradients (advisor repro)."""
        from deco_tpu.train.loop import Experiment

        config = {
            "tags": {"exp": "quant_guard"},
            "trainer": {"default_root_dir": str(tmp_path), "max_steps": 1},
            "model": {
                "vae": {"class_path": "src.models.autoencoder.pixel.PixelAE",
                        "init_args": {"scale": 1.0}},
                "denoiser": {
                    "class_path":
                        "src.models.transformer.dit_c2i_DeCo.PixNerDiT",
                    "init_args": {
                        "in_channels": 3, "patch_size": 4, "num_groups": 2,
                        "hidden_size": 32, "hidden_size_x": 8,
                        "num_blocks": 4, "num_cond_blocks": 2,
                        "nerf_mlpratio": 2, "num_classes": 2},
                },
                "conditioner": {
                    "class_path":
                        "src.models.conditioner.class_label.LabelConditioner",
                    "init_args": {"num_classes": 2}},
                "diffusion_trainer": {
                    "class_path": "src.diffusion.flow_matching."
                                  "training_repa_DeCo.REPATrainer",
                    "init_args": {
                        "lognorm_t": True, "null_condition_p": 0.2,
                        "scheduler": "src.diffusion.flow_matching."
                                     "scheduling.LinearScheduler"}},
                "diffusion_sampler": {
                    "class_path":
                        "src.diffusion.flow_matching.sampling.EulerSampler",
                    "init_args": {
                        "num_steps": 2, "guidance": 1.0,
                        "scheduler": "src.diffusion.flow_matching."
                                     "scheduling.LinearScheduler"}},
                "optimizer": {"class_path": "torch.optim.AdamW",
                              "init_args": {"lr": 1e-4}},
            },
            "data": {},
        }
        monkeypatch.setenv("DECO_QUANT", "int8")
        exp = Experiment(config)
        cond, _ = exp.conditioner([0, 1])
        with pytest.raises(ValueError, match="inference-only"):
            exp.init_state(jnp.zeros((2, 16, 16, 3)), cond)
        # the same init in a predict context strips the cache instead
        state = exp.init_state(jnp.zeros((2, 16, 16, 3)), cond,
                               training=False)
        assert "quant" not in state.params
        assert "params" in state.params

    def test_load_pipeline_int8_restores_and_refreshes(self, tmp_path,
                                                       monkeypatch):
        """serve.load_pipeline with DECO_QUANT=int8 + an orbax checkpoint:
        previously the restore template carried the init-time 'quant'
        collection (tree mismatch vs bf16-trained checkpoints), and a
        surviving cache would have served random-init weights. Now: restore
        is params-only and the cache is rebuilt from the restored params."""
        import optax
        import yaml

        from deco_tpu import serve
        from deco_tpu.models.conditioners import Qwen3TextEncoder
        from deco_tpu.models.dit_t2i import DeCoT2I
        from deco_tpu.models.layers import verify_quant_cache
        from deco_tpu.train.checkpoint import CheckpointManager
        from deco_tpu.train.state import TrainState

        kw = dict(in_channels=3, patch_size=4, num_groups=2, hidden_size=32,
                  decoder_hidden_size=8, num_encoder_blocks=2,
                  num_decoder_blocks=1, num_text_blocks=1, txt_embed_dim=16,
                  txt_max_length=6)
        cfg = {"model": {
            "vae": {"class_path": "src.models.autoencoder.pixel.PixelAE",
                    "init_args": {"scale": 1.0}},
            "denoiser": {"class_path": "deco_tpu.models.dit_t2i.DeCoT2I",
                         "init_args": kw},
            "conditioner": {
                "class_path": "deco_tpu.models.conditioners.Qwen3TextEncoder",
                "init_args": {"weight_path": None, "embed_dim": 16,
                              "max_length": 6}},
        }}
        cfg_path = tmp_path / "t2i.yaml"
        cfg_path.write_text(yaml.safe_dump(cfg))

        # train-side checkpoint: exact-path params (no quant collection),
        # deliberately different from any random init load_pipeline makes
        conditioner = Qwen3TextEncoder(weight_path=None, embed_dim=16,
                                       max_length=6)
        cond, _ = conditioner(["warmup"])
        m = DeCoT2I(**kw)
        v = m.init(jax.random.PRNGKey(42), jnp.zeros((1, 32, 32, 3)),
                   jnp.zeros((1,)), cond[:1])
        trained = _randomized(v["params"], jax.random.PRNGKey(9))
        state = TrainState.create({"params": trained}, optax.adamw(1e-4))
        ckpt_dir = str(tmp_path / "ckpt")
        CheckpointManager(ckpt_dir, 0).maybe_save(state, force=True)

        monkeypatch.setenv("DECO_QUANT", "int8")
        pipe = serve.load_pipeline(str(cfg_path), ckpt_dir, use_ema=False)
        assert "quant" in pipe.params
        # the Pipeline ctor already verified; assert explicitly that the
        # cache matches the RESTORED weights, not the init-time ones
        verify_quant_cache(pipe.params)
        got = np.asarray(jax.tree.leaves(pipe.params["params"])[0])
        want = np.asarray(jax.tree.leaves(
            jax.tree.map(lambda x: x.astype(jnp.float32), trained))[0])
        np.testing.assert_array_equal(got, want)
