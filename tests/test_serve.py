"""Serve pipeline: prompt -> images + trajectory frames on a tiny t2i model."""

import numpy as np
import pytest

from deco_tpu.models.autoencoders import PixelAE
from deco_tpu.models.conditioners import Qwen3TextEncoder
from deco_tpu.models.dit_t2i import DeCoT2I
from deco_tpu.serve import Pipeline

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def pipeline():
    model = DeCoT2I(
        in_channels=3, patch_size=4, num_groups=2, hidden_size=32,
        decoder_hidden_size=8, num_encoder_blocks=2, num_decoder_blocks=1,
        num_text_blocks=1, txt_embed_dim=16, txt_max_length=6,
        dtype=jnp.float32,
    )
    conditioner = Qwen3TextEncoder(weight_path=None, embed_dim=16, max_length=6)
    cond, _ = conditioner(["warmup"])
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), jnp.zeros((1,)),
        cond[:1],
    )
    # zero-init final layers make a fresh model output identically zero;
    # perturb all params so outputs depend on conditioning
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(1), len(leaves))
    leaves = [l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
              for l, k in zip(leaves, keys)]
    params = jax.tree.unflatten(treedef, leaves)
    return Pipeline(PixelAE(), model, conditioner, params, base_resolution=32)


class TestPipeline:
    def test_generate(self, pipeline):
        imgs = pipeline(
            ["a cat", "a dog"], height=32, width=32, num_steps=3, cfg=2.0,
        )
        assert len(imgs) == 2
        assert imgs[0].size == (32, 32)

    def test_trajectories(self, pipeline):
        imgs, gifs = pipeline(
            ["a cat"], height=32, width=32, num_steps=3, cfg=2.0,
            return_trajectories=True,
        )
        assert len(gifs) == 1 and len(gifs[0]) == 4  # noise + 3 steps

    def test_dispatch_chunks_matches_single(self, pipeline):
        """Pipeline(dispatch_chunks=N) must produce the same images as the
        single-dispatch path (the large-canvas serving mode). The reference
        path compiles a *different* XLA program (it collects trajectories),
        so allow 1 uint8 LSB of program-level rounding — exact chunked ==
        single equality is asserted at the sampler level in
        test_samplers.py::TestChunkedDispatch, where both sides run the
        same collect=False bodies."""
        a = pipeline(["a cat"], height=32, width=32, num_steps=4, cfg=2.0)
        b = pipeline(["a cat"], height=32, width=32, num_steps=4, cfg=2.0,
                     dispatch_chunks=2)
        np.testing.assert_allclose(
            np.asarray(a[0], np.int16), np.asarray(b[0], np.int16), atol=1)
        with pytest.raises(ValueError):
            pipeline(["a cat"], height=32, width=32, num_steps=2,
                     dispatch_chunks=2, return_trajectories=True)

    def test_jit_cache_bounded(self, pipeline):
        # each cache entry pins jitted executables; a long-lived server
        # cycling protocols must evict FIFO instead of leaking programs
        pipeline._jit_cache.clear()
        for i in range(pipeline._JIT_CACHE_MAX + 4):
            pipeline._get_sampler_fn(32, 32, 2, 1, 1.0 + i, 3.0)
        assert len(pipeline._jit_cache) == pipeline._JIT_CACHE_MAX
        pipeline._jit_cache.clear()

    def test_resolution_rounding(self, pipeline):
        imgs = pipeline(["x"], height=45, width=37, num_steps=2, cfg=1.5)
        assert imgs[0].size == (32, 32)  # rounded down to /32

    def test_negative_prompt_changes_output(self, pipeline):
        a = pipeline(["a cat"], num_steps=2, cfg=3.0, height=32, width=32)
        b = pipeline(["a cat"], negative_prompt="blurry", num_steps=2, cfg=3.0,
                     height=32, width=32)
        # negative prompt feeds the uncond branch -> different output
        assert not np.array_equal(np.asarray(a[0]), np.asarray(b[0]))


class TestPipelineRealTextEncoder:
    """t2i pipeline with the REAL HF Qwen3 path (synthesized tiny weights):
    prompts flow tokenizer -> Qwen3 -> fit-dim -> CFG sampler end-to-end."""

    @pytest.fixture(scope="class")
    def hf_pipeline(self, tmp_path_factory):
        pytest.importorskip("torch")
        pytest.importorskip("transformers")
        from tests.helpers_offline import build_tiny_qwen3

        d = build_tiny_qwen3(str(tmp_path_factory.mktemp("qwen3_serve")))
        conditioner = Qwen3TextEncoder(weight_path=d, embed_dim=16,
                                       max_length=6)
        model = DeCoT2I(
            in_channels=3, patch_size=4, num_groups=2, hidden_size=32,
            decoder_hidden_size=8, num_encoder_blocks=2, num_decoder_blocks=1,
            num_text_blocks=1, txt_embed_dim=16, txt_max_length=6,
            dtype=jnp.float32,
        )
        cond, _ = conditioner(["warmup"], {})
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
            jnp.zeros((1,)), cond[:1],
        )
        leaves, treedef = jax.tree.flatten(params)
        keys = jax.random.split(jax.random.PRNGKey(1), len(leaves))
        leaves = [l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
                  for l, k in zip(leaves, keys)]
        params = jax.tree.unflatten(treedef, leaves)
        return Pipeline(PixelAE(), model, conditioner, params,
                        base_resolution=32)

    def test_generate_with_real_conditioning(self, hf_pipeline):
        imgs = hf_pipeline(["a cat"], height=32, width=32, num_steps=4,
                           cfg=2.0, seed=0)
        assert len(imgs) == 1 and imgs[0].size == (32, 32)

    def test_prompts_differ(self, hf_pipeline):
        a = hf_pipeline(["a cat"], height=32, width=32, num_steps=4,
                        cfg=2.0, seed=0)
        b = hf_pipeline(["dog"], height=32, width=32, num_steps=4,
                        cfg=2.0, seed=0)
        import numpy as _np
        assert not _np.array_equal(_np.asarray(a[0]), _np.asarray(b[0]))
