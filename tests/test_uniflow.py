"""UniFlow unified understanding+generation stack tests (SURVEY §2.6)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deco_tpu.models.uniflow import UniFlowConfig, UniFlowVision
from deco_tpu.models.uniflow import components as C
from deco_tpu.models.uniflow.flow_decoder import FlowDecoder, flow_decoder_timesteps


def tiny_cfg(**kw):
    base = dict(
        vit_hidden_size=64, llm_hidden_size=48, num_hidden_layers=3,
        num_attention_heads=4, intermediate_size=128, patch_size=4,
        image_size=32, global_blocks_depth=2, num_decoder_layers=2,
        num_sampling_steps=3,
    )
    base.update(kw)
    return UniFlowConfig(**base)


class TestComponents:
    def test_resample_shapes_and_permutation(self):
        """Reference pixel_shuffle is NOT self-inverse; up(down(x)) is a fixed
        permutation of x's elements (verified against the torch steps)."""
        x = jnp.asarray(np.random.RandomState(0).randn(2, 16, 8), jnp.float32)
        down = C.resample_tokens(x, 0.5)
        assert down.shape == (2, 4, 32)
        up = C.resample_tokens(down, 2.0)
        assert up.shape == (2, 16, 8)
        # element multiset preserved per batch item
        np.testing.assert_allclose(
            np.sort(np.asarray(up).reshape(2, -1), axis=1),
            np.sort(np.asarray(x).reshape(2, -1), axis=1),
        )

    def test_downsample_matches_reference_layout(self):
        """Down x0.5 of an arange grid reproduces the torch unfold ordering."""
        # (1, 2x2 grid, 4ch) with values encoding (pos, ch)
        x = jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4)
        down = C.resample_tokens(x, 0.5)
        assert down.shape == (1, 1, 16)
        # torch steps: view(1,2,1,8)->permute->view(1,1,1,16)->permute
        expected = np.asarray(
            jnp.arange(16, dtype=jnp.float32)
            .reshape(1, 2, 2, 4)
            .reshape(1, 2, 1, 8)
            .transpose(0, 2, 1, 3)
            .reshape(1, 1, 1, 16)
            .transpose(0, 2, 1, 3)
        ).reshape(1, 1, 16)
        np.testing.assert_allclose(down, expected)

    def test_p2l_l2p_roundtrip(self):
        x = jnp.asarray(np.random.RandomState(1).randn(2, 8, 8, 3), jnp.float32)
        tokens = C.p2l_transform(x, 4)
        assert tokens.shape == (2, 4, 48)
        back = C.l2p_transform(tokens, 4)
        np.testing.assert_allclose(back, x)

    def test_sincos_pos_embed(self):
        pe = C.get_2d_sincos_pos_embed(64, 8)
        assert pe.shape == (64, 64)
        # embedding magnitudes bounded by 1
        assert np.abs(pe).max() <= 1.0 + 1e-6

    def test_flow_decoder_schedules(self):
        ts, dts = flow_decoder_timesteps(4, "linear")
        np.testing.assert_allclose(ts, [0.0, 0.25, 0.5, 0.75])
        np.testing.assert_allclose(dts, [0.25] * 4)
        ts_p, dts_p = flow_decoder_timesteps(4, "pow_0.25")
        assert len(ts_p) == 4 and dts_p.sum() == pytest.approx(1.0)


class TestUniFlow:
    @pytest.fixture(scope="class")
    def setup(self):
        model = UniFlowVision(tiny_cfg(), dtype=jnp.float32)
        x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 32, 3), jnp.float32)
        rng = jax.random.PRNGKey(0)
        params = model.init({"params": rng}, x, rng, method=model.forward_loss)
        return model, params, x

    def test_forward_loss_components(self, setup):
        model, params, x = setup
        losses = model.apply(params, x, jax.random.PRNGKey(1),
                             method=model.forward_loss)
        for k in ("distill_loss", "sem_mse_loss", "flow_loss", "loss"):
            assert k in losses and np.isfinite(float(losses[k])), k
        assert float(losses["loss"]) > 0

    def test_pixel_reconstruction(self, setup):
        model, params, x = setup
        img = model.apply(params, x, jax.random.PRNGKey(2), mode="pixel")
        assert img.shape == (2, 32, 32, 3)
        assert np.isfinite(np.asarray(img)).all()

    def test_semantic_reconstruction(self, setup):
        model, params, x = setup
        sem = model.apply(params, x, jax.random.PRNGKey(3), mode="semantic")
        # (B, grid^2/4 tokens, vit_hidden*4)
        assert sem.shape == (2, 16, 256)

    def test_teacher_distillation_path(self, setup):
        model, params, x = setup
        teacher = {
            "vit_embeds": jnp.ones((2, 16, 256)),
            "vit_embeds_mlp": jnp.ones((2, 16, 48)),
        }
        losses = model.apply(
            params, x, jax.random.PRNGKey(4), teacher_feat=teacher,
            method=model.forward_loss,
        )
        assert float(losses["vit_distill_loss"]) > 0

    def test_branch_toggles(self):
        model = UniFlowVision(
            tiny_cfg(enable_semantic_branch=False), dtype=jnp.float32
        )
        x = jnp.zeros((1, 32, 32, 3))
        rng = jax.random.PRNGKey(0)
        params = model.init({"params": rng}, x, rng, method=model.forward_loss)
        losses = model.apply(params, x, rng, method=model.forward_loss)
        assert "flow_loss" in losses and "sem_mse_loss" not in losses

    def test_gradients_flow(self, setup):
        model, params, x = setup

        def loss(p):
            return model.apply(p, x, jax.random.PRNGKey(5),
                               method=model.forward_loss)["loss"]

        g = jax.grad(loss)(params)
        gn = float(jnp.sqrt(sum(jnp.sum(jnp.square(l))
                                for l in jax.tree.leaves(g))))
        assert np.isfinite(gn) and gn > 0


class TestUniFlowConfigParity:
    """UniFlowConfig accepts the reference HF config surface unmodified
    (configuration_uniflow.py:11-107, VERDICT round-1 item 8)."""

    def test_vendored_config_json_loads(self):
        import os

        import deco_tpu.models.uniflow as pkg

        path = os.path.join(os.path.dirname(pkg.__file__), "config.json")
        cfg = UniFlowConfig.from_pretrained(path)
        assert cfg.vit_hidden_size == 1024
        assert cfg.num_hidden_layers == 24
        assert cfg.patch_size == 14
        assert cfg.image_size == 448
        assert cfg.latent_ch == 32
        assert cfg.global_blocks_depth == 6
        assert cfg.num_decoder_layers == 12
        # string-typed in the json ("4"), coerced like modeling_uniflow.py:729
        assert cfg.num_sampling_steps == 4
        assert isinstance(cfg.num_sampling_steps, int)
        assert cfg.norm_type == "layer_norm"
        assert cfg.qkv_bias and not cfg.qk_normalization

    def test_reference_config_json_roundtrips(self):
        """The reference's shipped config.json constructs without edits."""
        import json

        ref = "/root/reference/src/models/uniflow/config.json"
        import os

        if not os.path.exists(ref):
            pytest.skip("reference tree unavailable")
        with open(ref) as f:
            d = json.load(f)
        cfg = UniFlowConfig.from_dict(d)
        assert cfg.num_sampling_steps == 4
        # every architectural key in the json is represented
        for k in ("image_size", "patch_size", "num_hidden_layers",
                  "num_attention_heads", "intermediate_size", "latent_ch",
                  "llm_hidden_size", "global_blocks_depth",
                  "num_decoder_layers", "use_chal_proj", "use_disp_loss",
                  "use_global_blocks", "use_cfg", "decoder_type"):
            assert getattr(cfg, k) == (int(d[k]) if k == "num_sampling_steps"
                                       else d[k]), k

    def test_dcae_variant_forward_loss_and_reconstruction(self):
        """decoder_type="dcae" composes the pixel branch through the headless
        DC-AE decoder + a per-pixel flow head (UniFlowVisionModel_DCAE,
        modeling_uniflow_dcae.py:1127-1186 — upstream orphan, composed here)."""
        cfg = tiny_cfg(
            decoder_type="dcae", latent_ch=8,
            # up-block shortcut needs out*4 divisible by in (like Sana's)
            dcae_block_out_channels=(16, 32),
            dcae_layers_per_block=(1, 1),
            dcae_attention_stages=(False, False),
            dcae_flow_width=16, dcae_flow_depth=1,
        )
        model = UniFlowVision(cfg, dtype=jnp.float32)
        x = jnp.asarray(
            np.random.RandomState(0).randn(2, 32, 32, 3), jnp.float32)
        rng = jax.random.PRNGKey(0)
        params = model.init({"params": rng}, x, rng,
                            method=model.forward_loss)
        assert "dcae_decoder" in params["params"]
        assert "global_blocks_0" not in params["params"]
        losses = model.apply(params, x, jax.random.PRNGKey(1),
                             method=model.forward_loss)
        for k in ("flow_loss", "distill_loss", "loss"):
            assert k in losses and np.isfinite(float(losses[k])), k
        img = model.apply(params, x, jax.random.PRNGKey(2), mode="pixel")
        assert img.shape == (2, 32, 32, 3)
        assert np.isfinite(np.asarray(img)).all()

    def test_unused_decoder_knobs_roundtrip(self):
        """compression_layers / num_query_per_layer (config-accepted, model-
        unused upstream) are stored and serialized back as lists."""
        cfg = UniFlowConfig.from_dict({
            "compression_layers": [-1, 4], "num_query_per_layer": [64, 191],
            "num_sampling_steps": "7",
        })
        assert cfg.compression_layers == (-1, 4)
        assert cfg.num_query_per_layer == (64, 191)
        d = cfg.to_dict()
        assert d["compression_layers"] == [-1, 4]
        assert d["num_query_per_layer"] == [64, 191]
        assert cfg.num_sampling_steps == 7

    def test_vision_config_unwrap(self):
        cfg = UniFlowConfig.from_dict(
            {"vision_config": {"hidden_size": 96, "num_hidden_layers": 2}}
        )
        assert cfg.vit_hidden_size == 96
        assert cfg.num_hidden_layers == 2
