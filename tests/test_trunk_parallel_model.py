"""Model-level trunk_parallel knob: DeCoC2I runs its cond-block trunk under
the SP (sequence-parallel + ring attention) or TP (Megatron-style) executor.

The raw executors are equality-tested in test_sp_trunk.py / test_tp_trunk.py;
this file proves the USER-FACING integration — `DeCoC2I(trunk_parallel=...)`
under the ambient `jax.set_mesh` mesh (exactly how the Experiment loops run,
train/loop.py) — matches the sequential model bit-for-bit on fwd + grad and
composes with the full jitted train step on fsdp-sharded state. No reference
counterpart (upstream is DP-only, SURVEY §2.10).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from deco_tpu.diffusion.scheduling import LinearScheduler
from deco_tpu.diffusion.training import DeCoTrainer
from deco_tpu.models.dit_c2i_deco import DeCoC2I
from deco_tpu.parallel import mesh as mesh_lib
from deco_tpu.train.state import TrainState
from deco_tpu.train.train_step import make_train_step

# hidden=48 / heads=4: SwiGLU width int(2*4*48/3)=128 divides the 4-way
# model axis; 32px / patch 4 -> 64 tokens divide it too.
KW = dict(in_channels=3, patch_size=4, num_groups=4, hidden_size=48,
          hidden_size_x=16, num_blocks=4, num_cond_blocks=2, num_classes=10,
          dtype=jnp.float32)


def _data(batch=4):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(batch, 32, 32, 3), jnp.float32)
    t = jnp.asarray(rng.rand(batch), jnp.float32)
    y = jnp.asarray(rng.randint(0, 10, batch), jnp.int32)
    return x, t, y


@pytest.fixture(scope="module")
def base():
    x, t, y = _data()
    model = DeCoC2I(**KW)
    params = model.init(jax.random.PRNGKey(0), x, t, y)
    return model, params, (x, t, y)


@pytest.mark.parametrize("mode", ["sp", "tp"])
def test_forward_and_grad_match_sequential(base, mode):
    model, params, (x, t, y) = base
    ref = model.apply(params, x, t, y)

    def loss_ref(p):
        return jnp.sum(model.apply(p, x, t, y) ** 2)

    gref = jax.jit(jax.grad(loss_ref))(params)

    par = DeCoC2I(**KW, trunk_parallel=mode)
    mesh = mesh_lib.make_mesh(data=2, model=4)
    with jax.set_mesh(mesh):
        out = jax.jit(lambda p: par.apply(p, x, t, y))(params)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

        def loss(p):
            return jnp.sum(par.apply(p, x, t, y) ** 2)

        g = jax.jit(jax.grad(loss))(params)
    err = max(jax.tree.leaves(
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), g, gref)))
    assert err < 1e-4, f"{mode} grad mismatch {err}"


def test_sp_remat_train_path(base):
    """grad_checkpoint=True (the training posture) under the SP executor."""
    model, params, (x, t, y) = base

    def loss_ref(p):
        return jnp.sum(model.apply(p, x, t, y) ** 2)

    gref = jax.jit(jax.grad(loss_ref))(params)
    par = DeCoC2I(**{**KW, "grad_checkpoint": True}, trunk_parallel="sp")
    mesh = mesh_lib.make_mesh(data=1, model=8)
    with jax.set_mesh(mesh):
        g = jax.jit(jax.grad(lambda p: jnp.sum(par.apply(p, x, t, y) ** 2)))(
            params)
    err = max(jax.tree.leaves(
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), g, gref)))
    assert err < 1e-4


def test_full_train_step_on_sharded_state(base):
    """The jitted DeCoTrainer step with trunk_parallel='sp' on fsdp-sharded
    state matches the sequential step's loss (same rng, same batch)."""
    _, params, (x, t, y) = base
    trainer = DeCoTrainer(scheduler=LinearScheduler(), lognorm_t=True,
                          null_condition_p=0.0)
    tx = optax.adamw(1e-4, weight_decay=0.0)
    batch = dict(x=x, condition=y, uncondition=jnp.full_like(y, 10))
    rng = jax.random.PRNGKey(7)

    seq_model = DeCoC2I(**KW)
    seq_step = make_train_step(
        lambda p, xt, tt, yy: seq_model.apply(p, xt, tt, yy), trainer,
        donate=False)
    _, m_seq = seq_step(TrainState.create(params, tx), batch, rng)

    mesh = mesh_lib.make_mesh(data=2, model=4)
    par_model = DeCoC2I(**KW, trunk_parallel="sp")
    par_step = make_train_step(
        lambda p, xt, tt, yy: par_model.apply(p, xt, tt, yy), trainer,
        donate=False)
    state = TrainState.create(params, tx)
    state = state.replace(
        params=mesh_lib.shard_params(mesh, state.params, min_size=2**10),
        ema_params=mesh_lib.shard_params(mesh, state.ema_params,
                                         min_size=2**10),
    )
    sbatch = mesh_lib.shard_batch(mesh, batch)
    with jax.set_mesh(mesh):
        _, m_par = par_step(state, sbatch, rng)
    np.testing.assert_allclose(float(m_par["loss"]), float(m_seq["loss"]),
                               rtol=1e-4)


@pytest.mark.parametrize("mode", ["sp", "tp"])
def test_t2i_joint_trunk_sp_matches_sequential(mode):
    """DeCoT2I(trunk_parallel='sp'|'tp'): the joint-attention encoder runs
    under the SP (image tokens on the ring, text KV replicated) or TP
    (head/width split) executor and matches the sequential model on
    fwd + grad under the ambient mesh."""
    from deco_tpu.models.dit_t2i import DeCoT2I

    kw = dict(in_channels=3, patch_size=4, num_groups=4, hidden_size=48,
              decoder_hidden_size=16, num_encoder_blocks=2,
              num_decoder_blocks=1, num_text_blocks=1, txt_embed_dim=32,
              txt_max_length=12, dtype=jnp.float32)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32)
    t = jnp.asarray(rng.rand(2), jnp.float32)
    y = jnp.asarray(rng.randn(2, 12, 32), jnp.float32)

    model = DeCoT2I(**kw)
    params = model.init(jax.random.PRNGKey(0), x, t, y)
    ref = model.apply(params, x, t, y)
    gref = jax.jit(jax.grad(
        lambda p: jnp.sum(model.apply(p, x, t, y) ** 2)))(params)

    par = DeCoT2I(**kw, trunk_parallel=mode)
    mesh = mesh_lib.make_mesh(data=2, model=4)
    with jax.set_mesh(mesh):
        out = jax.jit(lambda p: par.apply(p, x, t, y))(params)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)
        g = jax.jit(jax.grad(
            lambda p: jnp.sum(par.apply(p, x, t, y) ** 2)))(params)
    err = max(jax.tree.leaves(
        jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), g, gref)))
    assert err < 1e-4, f"t2i {mode} grad mismatch {err}"


def test_config_level_sp_fit(tmp_path):
    """YAML-surface activation: a reference-style config with
    model.denoiser.init_args.trunk_parallel=sp + mesh_model_axis runs fit
    through the Experiment (the loops' jax.set_mesh provides the ambient
    mesh the executor resolves)."""
    from PIL import Image

    from deco_tpu.train.loop import Experiment

    root = tmp_path / "imgs"
    for cls in ("a", "b"):
        d = root / cls
        d.mkdir(parents=True)
        rng = np.random.RandomState(0)
        for i in range(4):
            Image.fromarray(
                rng.randint(0, 255, (20, 20, 3), np.uint8)
            ).save(d / f"{i}.png")

    config = {
        "tags": {"exp": "sp_cfg"},
        "mesh_model_axis": 4,
        "trainer": {"default_root_dir": str(tmp_path / "wd"),
                    "max_steps": 2, "log_every_n_steps": 1},
        "model": {
            "vae": {"class_path": "src.models.autoencoder.pixel.PixelAE",
                    "init_args": {"scale": 1.0}},
            "denoiser": {
                "class_path": "src.models.transformer.dit_c2i_DeCo.PixNerDiT",
                "init_args": {
                    "in_channels": 3, "patch_size": 4, "num_groups": 2,
                    "hidden_size": 32, "hidden_size_x": 8, "num_blocks": 4,
                    "num_cond_blocks": 2, "num_classes": 2,
                    "trunk_parallel": "sp",
                },
            },
            "conditioner": {
                "class_path":
                    "src.models.conditioner.class_label.LabelConditioner",
                "init_args": {"num_classes": 2}},
            "diffusion_trainer": {
                "class_path":
                    "src.diffusion.flow_matching.training_repa_DeCo"
                    ".REPATrainer",
                "init_args": {
                    "lognorm_t": True, "null_condition_p": 0.2,
                    "scheduler":
                        "src.diffusion.flow_matching.scheduling"
                        ".LinearScheduler"}},
            "diffusion_sampler": {
                "class_path":
                    "src.diffusion.flow_matching.sampling.EulerSampler",
                "init_args": {
                    "num_steps": 2, "guidance": 1.0,
                    "scheduler":
                        "src.diffusion.flow_matching.scheduling"
                        ".LinearScheduler",
                    "w_scheduler":
                        "src.diffusion.flow_matching.scheduling"
                        ".LinearScheduler",
                    "guidance_fn":
                        "src.diffusion.base.guidance.simple_guidance_fn",
                    "step_fn":
                        "src.diffusion.flow_matching.sampling.ode_step_fn"}},
            "diffusion_batch_mul": 1,
            "optimizer": {"class_path": "torch.optim.AdamW",
                          "init_args": {"lr": 1e-4}},
        },
        "data": {
            "train_dataset": {
                "class_path": "src.data.dataset.imagenet.PixImageNet",
                "init_args": {"root": str(root), "resolution": 16}},
            "train_batch_size": 4,
        },
    }
    exp = Experiment(config)
    state = exp.fit()
    assert int(state.step) == 2
    import json
    with open(f"{exp.workdir}/metrics.jsonl") as f:
        last = json.loads(f.readlines()[-1])
    assert np.isfinite(last["loss"])


def test_config_level_t2i_sp_fit(tmp_path):
    """t2i end-to-end fit through the Experiment with the joint trunk under
    SP: reference-style sft config (ImageText data, Qwen3TextEncoder
    hash-fallback conditioner, dit_t2i_DeCo dispatch) + trunk_parallel=sp +
    mesh_model_axis=4 — the first e2e t2i TRAIN flow in the suite, and it
    runs sequence-parallel on the 8-device mesh."""
    import json

    from PIL import Image

    from deco_tpu.train.loop import Experiment

    root = tmp_path / "pairs"
    root.mkdir()
    rng = np.random.RandomState(0)
    for i in range(4):
        Image.fromarray(
            rng.randint(0, 255, (20, 24, 3), np.uint8)
        ).save(root / f"{i}.png")
        (root / f"{i}.txt").write_text(f"a tiny test caption {i}")

    config = {
        "tags": {"exp": "t2i_sp_cfg"},
        "mesh_model_axis": 4,
        "trainer": {"default_root_dir": str(tmp_path / "wd"),
                    "max_steps": 2, "log_every_n_steps": 1},
        "model": {
            "vae": {"class_path": "src.models.autoencoder.pixel.PixelAE",
                    "init_args": {"scale": 1.0}},
            "denoiser": {
                "class_path": "src.models.transformer.dit_t2i_DeCo.PixNerDiT",
                "init_args": {
                    "in_channels": 3, "patch_size": 4, "num_groups": 4,
                    "hidden_size": 48, "txt_embed_dim": 16,
                    "txt_max_length": 6, "num_text_blocks": 1,
                    "decoder_hidden_size": 16, "num_encoder_blocks": 2,
                    "num_decoder_blocks": 1, "trunk_parallel": "sp",
                },
            },
            "conditioner": {
                "class_path":
                    "src.models.conditioner.qwen3_text_encoder"
                    ".Qwen3TextEncoder",
                "init_args": {"weight_path": None, "embed_dim": 16,
                              "max_length": 6}},
            "diffusion_trainer": {
                "class_path":
                    "src.diffusion.flow_matching.training_repa_DeCo"
                    ".REPATrainer",
                "init_args": {
                    "lognorm_t": True, "null_condition_p": 0.1,
                    "scheduler":
                        "src.diffusion.flow_matching.scheduling"
                        ".LinearScheduler"}},
            "diffusion_sampler": {
                "class_path":
                    "src.diffusion.flow_matching.adam_sampling.AdamLMSampler",
                "init_args": {
                    "num_steps": 2, "guidance": 1.0, "order": 2,
                    "scheduler":
                        "src.diffusion.flow_matching.scheduling"
                        ".LinearScheduler",
                    "guidance_fn":
                        "src.diffusion.base.guidance.simple_guidance_fn"}},
            "diffusion_batch_mul": 1,
            "optimizer": {"class_path": "torch.optim.AdamW",
                          "init_args": {"lr": 1e-4}},
        },
        "data": {
            "train_dataset": {
                "class_path": "src.data.dataset.image_txt.ImageText",
                "init_args": {"root": str(root), "resolution": 16}},
            "train_batch_size": 4,
        },
    }
    exp = Experiment(config)
    state = exp.fit()
    assert int(state.step) == 2
    with open(f"{exp.workdir}/metrics.jsonl") as f:
        last = json.loads(f.readlines()[-1])
    assert np.isfinite(last["loss"])


def test_error_paths(base):
    model, params, (x, t, y) = base
    mesh = mesh_lib.make_mesh(data=2, model=4)
    with pytest.raises(ValueError, match="trunk_parallel"):
        DeCoC2I(**KW, trunk_parallel="pp").apply(params, x, t, y)
    repa = DeCoC2I(**{**KW, "align_layer": 1}, trunk_parallel="sp")
    with jax.set_mesh(mesh):
        with pytest.raises(ValueError, match="REPA"):
            repa.apply(params, x, t, y, return_features=True)
    # no ambient mesh and no explicit mesh -> friendly error
    with pytest.raises(Exception, match="mesh"):
        DeCoC2I(**KW, trunk_parallel="sp").apply(params, x, t, y)
