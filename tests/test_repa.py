"""REPA feature-alignment trainer tests (reference training_repa.py parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from deco_tpu.diffusion.scheduling import LinearScheduler
from deco_tpu.diffusion.training import REPATrainer
from deco_tpu.models.dit_c2i_deco import DeCoC2I
from deco_tpu.train.state import TrainState
from deco_tpu.train.train_step import make_train_step


def make_parts():
    model = DeCoC2I(
        in_channels=3, patch_size=4, num_groups=2, hidden_size=32,
        hidden_size_x=8, num_blocks=4, num_cond_blocks=2, num_classes=10,
        align_layer=1,
    )

    def encoder(raw):  # fake frozen encoder: (B, H, W, 3) -> (B, 16, 24)
        b = raw.shape[0]
        pooled = raw.reshape(b, 4, 4, 4, 4, 3).mean(axis=(2, 4))
        return jnp.tile(pooled.reshape(b, 16, 3), (1, 1, 8))

    trainer = REPATrainer(
        scheduler=LinearScheduler(), lognorm_t=True, null_condition_p=0.2,
        encoder=encoder, align_layer=1, proj_denoiser_dim=32,
        proj_hidden_dim=32, proj_encoder_dim=24, feat_loss_weight=0.5,
    )
    return model, trainer


class TestREPA:
    def test_cos_loss_present_and_grads_flow(self):
        model, trainer = make_parts()
        x = jnp.zeros((2, 16, 16, 3))
        t0 = jnp.zeros((2,))
        y0 = jnp.zeros((2,), jnp.int32)
        rng = jax.random.PRNGKey(0)
        mparams = model.init(rng, x, t0, y0)
        tparams = trainer.init_params(rng)
        assert tparams  # proj MLP params exist

        params = {"model": mparams, "trainer": tparams}
        batch = dict(
            x=jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3)),
            condition=jnp.asarray([1, 2]),
            uncondition=jnp.full((2,), 10),
            metadata={"raw_image": jax.random.uniform(
                jax.random.PRNGKey(2), (2, 16, 16, 3))},
        )
        tx = optax.adamw(1e-3)
        state = TrainState.create(params, tx)
        apply_fn = lambda p, xt, t, y, **kw: model.apply(p, xt, t, y, **kw)
        step = make_train_step(apply_fn, trainer, donate=False)
        s1, metrics = step(state, batch, jax.random.PRNGKey(3))
        assert "cos_loss" in metrics and np.isfinite(float(metrics["cos_loss"]))
        assert float(metrics["cos_loss"]) > 0
        # proj params must receive gradient (they changed)
        d = jax.tree.map(
            lambda a, b: float(np.abs(a - b).max()),
            s1.params["trainer"], state.params["trainer"],
        )
        assert max(jax.tree.leaves(d)) > 0

    def test_precomputed_features_path(self):
        model, trainer = make_parts()
        trainer.encoder = None  # features come from the input pipeline
        x = jnp.zeros((2, 16, 16, 3))
        rng = jax.random.PRNGKey(0)
        mparams = model.init(rng, x, jnp.zeros((2,)), jnp.zeros((2,), jnp.int32))
        tparams = trainer.init_params(rng)
        net = lambda xt, t, y, **kw: model.apply(mparams, xt, t, y, **kw)
        out = trainer(
            jax.random.PRNGKey(1), net,
            jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 3)),
            jnp.asarray([0, 1]), jnp.full((2,), 10),
            metadata={"repa_features": jnp.ones((2, 16, 24))},
            params=tparams,
        )
        assert np.isfinite(float(out["loss"]))
        assert float(out["cos_loss"]) > 0


def test_repa_fit_wires_metadata_through_production_loop(tmp_path):
    """The REAL bug this guards: Experiment.fit must forward the trainer's
    declared metadata arrays (raw_image) into the jitted step — without it
    the cosine-alignment loss silently trains as 0. Mirrors
    configs_c2i/Baseline_DiT.yaml's trainer surface (training_repa.REPATrainer
    + DINOv2 encoder — random-weight fallback here) on tiny shapes, including
    diffusion_batch_mul=2 (metadata must replicate with the latents)."""
    import json
    import os

    from PIL import Image

    from deco_tpu.train.loop import Experiment

    root = tmp_path / "imagenet"
    rng_np = np.random.RandomState(0)
    for cls in ["a", "b"]:
        d = root / cls
        d.mkdir(parents=True)
        for i in range(4):
            Image.fromarray(
                rng_np.randint(0, 255, (36, 36, 3), np.uint8)
            ).save(d / f"{i}.png")

    config = {
        "tags": {"exp": "tiny_repa_fit"},
        "trainer": {"default_root_dir": str(tmp_path / "work"),
                    "max_steps": 2, "log_every_n_steps": 1},
        "model": {
            "vae": {"class_path": "src.models.autoencoder.pixel.PixelAE",
                    "init_args": {"scale": 1.0}},
            "denoiser": {
                "class_path": "src.models.transformer.dit_c2i_DeCo.PixNerDiT",
                "init_args": {"in_channels": 3, "patch_size": 4,
                              "num_groups": 2, "hidden_size": 32,
                              "hidden_size_x": 8, "num_blocks": 4,
                              "num_cond_blocks": 2, "nerf_mlpratio": 2,
                              "num_classes": 2},
            },
            "conditioner": {
                "class_path":
                    "src.models.conditioner.class_label.LabelConditioner",
                "init_args": {"num_classes": 2},
            },
            "diffusion_trainer": {
                "class_path":
                    "src.diffusion.flow_matching.training_repa.REPATrainer",
                "init_args": {
                    "lognorm_t": True, "null_condition_p": 0.2,
                    "align_layer": 2, "proj_denoiser_dim": 32,
                    "proj_hidden_dim": 16, "proj_encoder_dim": 24,
                    "scheduler": "src.diffusion.flow_matching.scheduling"
                                 ".LinearScheduler",
                    "encoder": {
                        "class_path": "src.models.encoder.DINOv2",
                        "init_args": {"hidden_size": 24, "num_layers": 1,
                                      "num_heads": 2},
                    },
                },
            },
            "diffusion_sampler": {
                "class_path": "src.diffusion.flow_matching.sampling"
                              ".EulerSampler",
                "init_args": {
                    "num_steps": 2, "guidance": 1.0,
                    "scheduler": "src.diffusion.flow_matching.scheduling"
                                 ".LinearScheduler",
                    "guidance_fn":
                        "src.diffusion.base.guidance.simple_guidance_fn",
                    "step_fn":
                        "src.diffusion.flow_matching.sampling.ode_step_fn",
                },
            },
            "ema_tracker": {"class_path": "src.callbacks.simple_ema.SimpleEMA",
                            "init_args": {"decay": 0.999}},
            "optimizer": {"class_path": "torch.optim.AdamW",
                          "init_args": {"lr": 1e-4, "weight_decay": 0.0}},
            "diffusion_batch_mul": 2,
        },
        "data": {
            "train_dataset": {
                "class_path": "src.data.dataset.imagenet.PixImageNet",
                "init_args": {"root": str(root), "resolution": 16},
            },
            "train_batch_size": 4,
            "train_num_workers": 1,
        },
    }
    exp = Experiment(config)
    exp.fit()
    metrics_path = os.path.join(exp.workdir, "metrics.jsonl")
    rows = [json.loads(l) for l in open(metrics_path)]
    cos = [r["cos_loss"] for r in rows if "cos_loss" in r]
    assert cos, f"cos_loss never logged: {rows}"
    assert all(np.isfinite(c) for c in cos)
    assert max(cos) > 1e-4, f"REPA term silently zero through fit: {cos}"
