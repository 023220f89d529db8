"""UniFlow experiment: training step, freeze flags, padded reconstruction."""

import jax
import jax.numpy as jnp
import numpy as np

from deco_tpu.models.uniflow import UniFlowConfig
from deco_tpu.train.freeze import freeze_mask, with_frozen
from deco_tpu.train.uniflow_loop import UniFlowExperiment, UniFlowTrainConfig


def tiny_exp(**train_kw):
    cfg = UniFlowConfig(
        vit_hidden_size=64, llm_hidden_size=24, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64, patch_size=4,
        image_size=32, global_blocks_depth=1, num_decoder_layers=1,
        num_sampling_steps=2,
    )
    return UniFlowExperiment(
        cfg, UniFlowTrainConfig(warmup_steps=2, total_steps=10, **train_kw),
        dtype=jnp.float32,
    )


class TestUniFlowTraining:
    def test_train_step_updates(self):
        exp = tiny_exp()
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
        state = exp.init_state(jax.random.PRNGKey(1), x)
        step = exp.make_train_step(donate=False)
        s1, m1 = step(state, {"x": x}, jax.random.PRNGKey(2))
        # warmup LR is 0 at step 0 (HF cosine-with-warmup semantics);
        # the second step moves params
        s2, m2 = step(s1, {"x": x}, jax.random.PRNGKey(3))
        assert np.isfinite(float(m2["loss"]))
        assert "grad_norm" in m2
        d = jax.tree.map(lambda a, b: float(np.abs(a - b).max()),
                         s2.params, state.params)
        assert max(jax.tree.leaves(d)) > 0

    def test_frozen_encoder_params_static(self):
        exp = tiny_exp(frozen_encoder=True)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
        state = exp.init_state(jax.random.PRNGKey(1), x)
        step = exp.make_train_step(donate=False)
        s1, _ = step(state, {"x": x}, jax.random.PRNGKey(2))
        s1, _ = step(s1, {"x": x}, jax.random.PRNGKey(3))
        frozen_delta = jax.tree.map(
            lambda a, b: float(np.abs(a - b).max()),
            s1.params["params"]["vision"], state.params["params"]["vision"],
        )
        assert max(jax.tree.leaves(frozen_delta)) == 0.0
        live_delta = jax.tree.map(
            lambda a, b: float(np.abs(a - b).max()),
            s1.params["params"]["flow_head"], state.params["params"]["flow_head"],
        )
        assert max(jax.tree.leaves(live_delta)) > 0

    def test_padded_reconstruction(self):
        exp = tiny_exp()
        # square inputs only: token resampling assumes a square grid (the
        # reference's downsample_tokens has the same h=w=sqrt(N) assumption)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 30, 30, 3))
        state = exp.init_state(jax.random.PRNGKey(1),
                               jnp.zeros((1, 56, 56, 3)))
        out = exp.reconstruct(state.params, x, jax.random.PRNGKey(2))
        assert out.shape == (1, 30, 30, 3)

    def test_freeze_mask(self):
        params = {"params": {"vision": {"w": jnp.zeros(2)},
                             "head": {"w": jnp.zeros(2)}}}
        mask = freeze_mask(params, ["params/vision"])
        assert mask["params"]["vision"]["w"] is False
        assert mask["params"]["head"]["w"] is True
