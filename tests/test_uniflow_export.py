"""UniFlow flax <-> torch-layout round trip (reference checkpoint interchange)."""

import jax
import jax.numpy as jnp
import numpy as np

from deco_tpu.convert.uniflow_bridge import (
    uniflow_params_from_torch,
    uniflow_params_to_torch,
)
from deco_tpu.models.uniflow.model import UniFlowConfig, UniFlowVision


def _merge(a, b):
    out = dict(a)
    for k, v in b.items():
        if k in out and isinstance(v, dict):
            out[k] = _merge(out[k], v)
        else:
            out[k] = v
    return out


_CACHE = {}


def _tiny_params():
    if "params" in _CACHE:
        return _CACHE["params"]
    cfg = UniFlowConfig(
        vit_hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, patch_size=14, image_size=56,
        llm_hidden_size=32, global_blocks_depth=1, num_decoder_layers=2,
    )
    m = UniFlowVision(cfg)
    x = jnp.zeros((2, 56, 56, 3))
    rng = jax.random.PRNGKey(1)
    pix = m.init({"params": jax.random.PRNGKey(0)}, x, rng)["params"]
    sem = m.init({"params": jax.random.PRNGKey(0)}, x, rng,
                 mode="semantic")["params"]
    _CACHE["params"] = jax.tree.map(np.asarray, _merge(pix, sem))
    return _CACHE["params"]


class TestUniFlowExport:
    def test_roundtrip_identity(self):
        params = _tiny_params()
        sd = uniflow_params_to_torch(params)
        back = uniflow_params_from_torch(sd)
        flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
        flat_b = jax.tree_util.tree_flatten_with_path(back)[0]
        keys_a = {tuple(k.key for k in p) for p, _ in flat_a}
        keys_b = {tuple(k.key for k in p) for p, _ in flat_b}
        assert keys_a == keys_b, keys_a ^ keys_b
        bd = {tuple(k.key for k in p): l for p, l in flat_b}
        for p, leaf in flat_a:
            key = tuple(k.key for k in p)
            np.testing.assert_array_equal(np.asarray(leaf), bd[key], err_msg=str(key))

    def test_reference_key_layout(self):
        sd = uniflow_params_to_torch(_tiny_params())
        assert all(k.startswith("model.") for k in sd)
        for k in [
            "model.embeddings.class_embedding",
            "model.encoder.layers.1.attn.qkv.weight",
            "model.shallow_encoder.layers.3.mlp.fc2.bias",
            "model.shallow_embeddings.position_embedding",
            "model.mlp1.1.weight",
            "model.shared_latent_proj.res_blocks.2.adaLN_modulation.1.weight",
            "model.shared_latent_proj.final_layer.linear.bias",
            "model.gen_latent_proj.0.weight",
            "model.global_blocks.0.mlp.w12.weight",
            "model.global_blocks.0.attn.q_norm.weight",
            "model.flow_head.net.time_embed.mlp.0.weight",
            "model.flow_head.net.res_blocks.1.in_ln.weight",
            "model.sem_latent_proj.2.bias",
            "model.sem_global_blocks.0.norm2.weight",
            "model.sem_flow_head.nerf_embedder.embedder.0.weight",
            "model.sem_flow_head.net.final_layer.adaLN_modulation.1.bias",
        ]:
            assert k in sd, k
        # fused w12 = [w1; gate] stacked on the output axis (torch rows)
        w12 = sd["model.global_blocks.0.mlp.w12.weight"]
        assert w12.shape == (2 * 256, 64)

    def test_mask_token_zero_fill(self):
        """A true reference checkpoint has no mask_token keys -> zero init."""
        params = _tiny_params()
        sd = uniflow_params_to_torch(params)
        sd = {k: v for k, v in sd.items() if not k.endswith("mask_token")}
        back = uniflow_params_from_torch(sd)
        assert np.all(back["flow_head"]["mask_token"] == 0)
        assert back["flow_head"]["mask_token"].shape == \
            params["flow_head"]["mask_token"].shape

    def test_ema_namespace_selection(self):
        params = _tiny_params()
        sd = uniflow_params_to_torch(params)
        ema = {k.replace("model.", "ema_model.", 1): v * 0 + 7.0
               for k, v in sd.items()}
        both = {**sd, **ema}
        main = uniflow_params_from_torch(both)
        np.testing.assert_array_equal(
            main["mlp1_fc1"]["kernel"], params["mlp1_fc1"]["kernel"])
        emap = uniflow_params_from_torch(both, use_ema=True)
        assert np.all(emap["mlp1_fc1"]["kernel"] == 7.0)
