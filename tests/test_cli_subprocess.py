"""CLI shell-surface test: python -m deco_tpu.cli fit/predict on a tiny config."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
import yaml
from PIL import Image


@pytest.fixture(scope="module")
def tiny_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    img_root = root / "imgs"
    (img_root / "c0").mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(4):
        Image.fromarray(rng.randint(0, 255, (40, 40, 3), np.uint8)).save(
            img_root / "c0" / f"{i}.png"
        )
    config = {
        "tags": {"exp": "cli_test"},
        "trainer": {
            "default_root_dir": str(root / "work"),
            "max_steps": 2,
            "log_every_n_steps": 1,
            "callbacks": [
                {"class_path": "src.callbacks.save_images.SaveImagesHook",
                 "init_args": {"save_dir": "val", "save_compressed": True}},
            ],
        },
        "model": {
            "vae": {"class_path": "src.models.autoencoder.pixel.PixelAE"},
            "denoiser": {
                "class_path": "src.models.transformer.dit_c2i_DeCo.PixNerDiT",
                "init_args": {"in_channels": 3, "patch_size": 4,
                              "num_groups": 2, "hidden_size": 32,
                              "hidden_size_x": 8, "num_blocks": 3,
                              "num_cond_blocks": 2, "num_classes": 2},
            },
            "conditioner": {
                "class_path": "src.models.conditioner.class_label.LabelConditioner",
                "init_args": {"num_classes": 2},
            },
            "diffusion_trainer": {
                "class_path":
                    "src.diffusion.flow_matching.training_repa_DeCo.REPATrainer",
                "init_args": {"scheduler":
                    "src.diffusion.flow_matching.scheduling.LinearScheduler"},
            },
            "diffusion_sampler": {
                "class_path": "src.diffusion.flow_matching.sampling.EulerSampler",
                "init_args": {"num_steps": 2, "guidance": 2.0, "scheduler":
                    "src.diffusion.flow_matching.scheduling.LinearScheduler"},
            },
        },
        "data": {
            "train_dataset": {
                "class_path": "src.data.dataset.imagenet.PixImageNet",
                "init_args": {"root": str(img_root), "resolution": 16},
            },
            "pred_dataset": {
                "class_path": "src.data.dataset.randn.ClassLabelRandomNDataset",
                "init_args": {"num_classes": 2, "max_num_instances": 2,
                              "latent_shape": [3, 16, 16]},
            },
            "train_batch_size": 1,
            "train_num_workers": 1,
            "pred_batch_size": 1,
            "pred_num_workers": 1,
        },
    }
    cfg_path = root / "config.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(config, f)
    return str(cfg_path), str(root / "work" / "cli_test")


def _run(args):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PYTHONPATH", None)
    env["PYTHONPATH"] = os.getcwd()
    return subprocess.run(
        [sys.executable, "-m", "deco_tpu.cli", *args],
        capture_output=True, text=True, env=env, timeout=900,
    )


def test_cli_fit_then_predict(tiny_setup):
    cfg_path, workdir = tiny_setup
    r = _run(["fit", "-c", cfg_path, "--max_steps=2"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(os.path.join(workdir, "metrics.jsonl"))
    with open(os.path.join(workdir, "metrics.jsonl")) as f:
        records = [json.loads(l) for l in f.read().splitlines()]
    assert any("loss" in rec for rec in records)

    r2 = _run(["predict", "-c", cfg_path, "--resume", "--max_batches=1"])
    assert r2.returncode == 0, r2.stderr[-2000:]
    val_dirs = [d for d in os.listdir(workdir) if d.startswith("val")]
    assert val_dirs


def test_cli_bad_config_errors(tiny_setup, tmp_path):
    bad = tmp_path / "bad.yaml"
    bad.write_text("model: {}\ndata: {}\n")
    r = _run(["fit", "-c", str(bad)])
    assert r.returncode != 0
