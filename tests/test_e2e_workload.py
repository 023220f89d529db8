"""End-to-end c2i workload: reference-style config -> fit -> predict -> npz.

Exercises the full call stack of SURVEY §3.1/§3.2 on tiny shapes: config
translation registry, ADM-crop folder dataset, sharded loader, jitted train
step with EMA, Orbax checkpoints, seeded-noise predict with the Euler CFG
sampler, per-sample PNG saves and the ADM output.npz export.
"""

import json
import os

import numpy as np
import pytest
import yaml
from PIL import Image


@pytest.fixture(scope="module")
def image_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("imagenet")
    rng = np.random.RandomState(0)
    for cls in ["class_a", "class_b"]:
        d = root / cls
        d.mkdir()
        for i in range(6):
            arr = rng.randint(0, 255, (40, 48, 3), np.uint8)
            Image.fromarray(arr).save(d / f"{i}.png")
    return str(root)


@pytest.fixture(scope="module")
def config(image_root, tmp_path_factory):
    workroot = str(tmp_path_factory.mktemp("workdirs"))
    # mirrors configs_c2i/DeCo_XL.yaml structure with reference class paths
    return {
        "seed_everything": True,
        "tags": {"exp": "tiny_deco_test"},
        "trainer": {
            "default_root_dir": workroot,
            "max_steps": 3,
            "log_every_n_steps": 1,
            "callbacks": [
                {
                    "class_path": "src.callbacks.model_checkpoint.CheckpointHook",
                    "init_args": {"every_n_train_steps": 2},
                },
                {
                    "class_path": "src.callbacks.save_images.SaveImagesHook",
                    "init_args": {"save_dir": "val_test", "save_compressed": True},
                },
            ],
        },
        "model": {
            "vae": {
                "class_path": "src.models.autoencoder.pixel.PixelAE",
                "init_args": {"scale": 1.0},
            },
            "denoiser": {
                "class_path": "src.models.transformer.dit_c2i_DeCo.PixNerDiT",
                "init_args": {
                    "in_channels": 3, "patch_size": 4, "num_groups": 2,
                    "hidden_size": 32, "hidden_size_x": 8, "num_blocks": 4,
                    "num_cond_blocks": 2, "nerf_mlpratio": 2, "num_classes": 2,
                },
            },
            "conditioner": {
                "class_path": "src.models.conditioner.class_label.LabelConditioner",
                "init_args": {"num_classes": 2},
            },
            "diffusion_trainer": {
                "class_path":
                    "src.diffusion.flow_matching.training_repa_DeCo.REPATrainer",
                "init_args": {
                    "lognorm_t": True, "null_condition_p": 0.2,
                    "scheduler":
                        "src.diffusion.flow_matching.scheduling.LinearScheduler",
                },
            },
            "diffusion_sampler": {
                "class_path": "src.diffusion.flow_matching.sampling.EulerSampler",
                "init_args": {
                    "num_steps": 4, "guidance": 3.2,
                    "guidance_interval_min": 0.1, "guidance_interval_max": 1.0,
                    "scheduler":
                        "src.diffusion.flow_matching.scheduling.LinearScheduler",
                    "w_scheduler":
                        "src.diffusion.flow_matching.scheduling.LinearScheduler",
                    "guidance_fn": "src.diffusion.base.guidance.simple_guidance_fn",
                    "step_fn": "src.diffusion.flow_matching.sampling.ode_step_fn",
                },
            },
            "ema_tracker": {
                "class_path": "src.callbacks.simple_ema.SimpleEMA",
                "init_args": {"decay": 0.9999},
            },
            "optimizer": {
                "class_path": "torch.optim.AdamW",
                "init_args": {"lr": 1e-4, "weight_decay": 0.0},
            },
        },
        "data": {
            "train_dataset": {
                "class_path": "src.data.dataset.imagenet.PixImageNet",
                "init_args": {"root": image_root, "resolution": 16},
            },
            "pred_dataset": {
                "class_path": "src.data.dataset.randn.ClassLabelRandomNDataset",
                "init_args": {
                    "num_classes": 2, "max_num_instances": 4,
                    "latent_shape": [3, 16, 16],
                },
            },
            "train_batch_size": 4,
            "train_num_workers": 2,
            "pred_batch_size": 4,
            "pred_num_workers": 1,
        },
    }


class TestEndToEnd:
    def test_fit_and_predict(self, config):
        from deco_tpu.train.loop import Experiment

        exp = Experiment(config)
        state = exp.fit()
        assert int(state.step) == 3
        # config snapshot + metrics written
        assert os.path.exists(os.path.join(exp.workdir, "config.yaml"))
        lines = open(os.path.join(exp.workdir, "metrics.jsonl")).read().splitlines()
        records = [json.loads(l) for l in lines]
        assert any("loss" in r for r in records)
        # checkpoints at step 2 (interval) and 3 (final forced)
        ckpts = os.listdir(os.path.join(exp.workdir, "checkpoints"))
        assert len(ckpts) >= 2

        npz_path = exp.predict(state=state)
        assert npz_path is not None and os.path.exists(npz_path)
        arr = np.load(npz_path)["arr_0"]
        assert arr.shape == (32, 16, 16, 3) and arr.dtype == np.uint8  # per-device batch 4 x 8 devices (tiny dataset padded)
        pngs = [f for f in os.listdir(os.path.dirname(npz_path))
                if f.endswith(".png")]
        assert len(pngs) > 0

    def test_predict_with_metrics_hook_writes_predict_metrics(
            self, config, image_root, tmp_path):
        """Regression: the CLI predict path with a ComputeMetricsHook config
        (every reference vae/ReCo config wires one) must aggregate and write
        predict_metrics.json — a rename once left loop.py reading a stale
        private attribute, raising AttributeError after sampling and losing
        both the metrics and the ADM npz export."""
        from deco_tpu.train.loop import Experiment

        cfg = dict(config)
        cfg["tags"] = {"exp": "metrics_predict_test"}
        cfg["trainer"] = dict(
            config["trainer"],
            default_root_dir=str(tmp_path),
            max_steps=1,
            callbacks=config["trainer"]["callbacks"] + [{
                "class_path":
                    "src.callbacks.compute_metrics.ComputeMetricsHook",
                "init_args": {"compute_fid": False},
            }],
        )
        # a pred dataset whose metadata carries raw_image (reconstruction
        # protocol) so the hook's on_batch_end branch actually runs
        cfg["data"] = dict(
            config["data"],
            pred_dataset={
                "class_path": "src.data.dataset.imagenet.PixImageNet",
                "init_args": {"root": image_root, "resolution": 16},
            },
        )
        exp = Experiment(cfg)
        state = exp.fit()
        npz_path = exp.predict(state=state)
        assert npz_path is not None and os.path.exists(npz_path)
        mpath = os.path.join(exp.workdir, "predict_metrics.json")
        assert os.path.exists(mpath)
        scores = json.load(open(mpath))
        assert "metrics/psnr" in scores and "metrics/ssim" in scores
        # NOTE: inf is legitimate here — the DiT head is zero-init, so a
        # 1-step-trained model integrates ~zero velocity and the Euler
        # sampler reproduces its (image-seeded) input bit-exactly; the
        # torchmetrics-exact PSNR of a perfect reconstruction is +inf.
        assert not np.isnan(scores["metrics/psnr"])
        assert scores["metrics/psnr"] > 0

    def test_sigterm_preemption_checkpoints_and_exits_cleanly(
            self, config, monkeypatch, tmp_path):
        """First SIGTERM mid-fit -> loop breaks, final forced checkpoint
        lands, fit returns normally (utils/preemption.PreemptionGuard; the
        reference has no preemption handling at all, SURVEY §5)."""
        import signal

        import jax

        from deco_tpu.train.loop import Experiment

        cfg = dict(config)
        cfg["tags"] = {"exp": "preempt_test"}
        cfg["trainer"] = dict(config["trainer"],
                              default_root_dir=str(tmp_path), max_steps=50)

        from deco_tpu.train import hooks

        calls = {"n": 0}
        orig = hooks.ScalarLogger.log

        def patched(self, step, metrics):
            # ScalarLogger.log runs once per train step INSIDE the guarded
            # loop; deliver SIGTERM synchronously on the 2nd step (handler
            # runs immediately in the main thread — no timer races)
            calls["n"] += 1
            if calls["n"] == 2:
                signal.raise_signal(signal.SIGTERM)
            return orig(self, step, metrics)

        monkeypatch.setattr(hooks.ScalarLogger, "log", patched)
        exp = Experiment(cfg)
        state = exp.fit()  # must return, not die
        assert 1 <= int(state.step) < 50
        ckpts = os.listdir(os.path.join(exp.workdir, "checkpoints"))
        assert len(ckpts) >= 1
        # handler restored after the guard exits
        assert signal.getsignal(signal.SIGTERM) in (
            signal.SIG_DFL, signal.default_int_handler, None,
        ) or callable(signal.getsignal(signal.SIGTERM))

    def test_resume_continues_from_checkpoint(self, config, tmp_path):
        # restore mid-run and keep training: the host-tracked step counter
        # (loop.py fit) must pick up at the restored step, and the checkpoint
        # cadence must stay aligned to global steps
        from deco_tpu.train.loop import Experiment

        cfg = dict(config)
        cfg["tags"] = {"exp": "resume_test"}
        cfg["trainer"] = dict(config["trainer"],
                              default_root_dir=str(tmp_path), max_steps=3)
        state = Experiment(cfg).fit()
        assert int(state.step) == 3

        cfg2 = dict(cfg)
        cfg2["trainer"] = dict(cfg["trainer"], max_steps=6)
        exp2 = Experiment(cfg2, resume=True)
        state2 = exp2.fit()  # auto-restores the latest checkpoint (step 3)
        assert int(state2.step) == 6
        ckpt_steps = sorted(
            int(d) for d in os.listdir(
                os.path.join(exp2.workdir, "checkpoints")) if d.isdigit())
        # interval 2 -> steps 2,4,6 (+ forced final 3 from run 1)
        assert 4 in ckpt_steps and 6 in ckpt_steps

    def test_resume_continues_data_order(self, config, tmp_path, monkeypatch):
        """A resumed fit must fast-forward the loader to the restored step
        (deterministic mid-epoch data resume) instead of re-serving the head
        of the dataset."""
        from deco_tpu.data.loader import ShardedLoader
        from deco_tpu.train.loop import Experiment

        cfg = dict(config)
        cfg["tags"] = {"exp": "resume_data_order"}
        cfg["trainer"] = dict(config["trainer"],
                              default_root_dir=str(tmp_path), max_steps=2)
        state = Experiment(cfg).fit()
        assert int(state.step) == 2

        calls = []
        orig = ShardedLoader.set_position

        def spy(self, n):
            calls.append(n)
            return orig(self, n)

        monkeypatch.setattr(ShardedLoader, "set_position", spy)
        cfg2 = dict(cfg)
        cfg2["trainer"] = dict(cfg["trainer"], max_steps=4)
        state2 = Experiment(cfg2, resume=True).fit()
        assert int(state2.step) == 4
        assert calls == [2]  # loader fast-forwarded to the restored step

    def test_workdir_guard(self, config):
        from deco_tpu.train.loop import Experiment

        with pytest.raises(FileExistsError):
            Experiment(config)  # non-empty workdir, no resume

        exp = Experiment(config, resume=True)  # resume path allowed
        assert exp.workdir.endswith("tiny_deco_test")

    def test_cli_override_parsing(self):
        from deco_tpu.cli import _parse_value

        assert _parse_value("3") == 3
        assert _parse_value("0.5") == 0.5
        assert _parse_value("true") is True
        assert _parse_value("none") is None
        assert _parse_value("hello") == "hello"
