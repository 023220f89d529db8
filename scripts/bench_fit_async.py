"""A/B the async production train loop (Experiment.fit) on the chip.

`Experiment.fit` tracks the global step on the host and lets dispatch run
up to `_TRAIN_RUNAHEAD` steps ahead of the chip, overlapping host batch work
(JPEG decode via the native data plane, ADM crop, conditioning, H2D over the
relay, sharding) with device compute. The reference loop is synchronous per
step (Lightning fit loop, src/lightning_model.py:129-206 of hhhhzp/DeCo).

Protocol: DeCo-XL 256px, freq loss, adamw+EMA, full remat, batch 24/chip —
the recorded envelope config (CLAUDE.md bench history). For each run-ahead
setting, fit() runs twice from scratch (short and long); the steady-state
rate is the step delta over the wall-clock delta, cancelling init/compile
and the final forced checkpoint that both runs pay. The loader feeds real
512x384 JPEGs so the host share is honest.

Usage: python scripts/bench_fit_async.py [steps_long=16] [batch=24]
"""

import os
import shutil
import sys
import tempfile
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_jpeg_root(n_images=240, n_classes=8, seed=0):
    root = tempfile.mkdtemp(prefix="fitbench_imgs_")
    rng = np.random.RandomState(seed)
    for i in range(n_images):
        d = os.path.join(root, f"class_{i % n_classes:03d}")
        os.makedirs(d, exist_ok=True)
        arr = rng.randint(0, 255, (384, 512, 3), np.uint8)
        Image.fromarray(arr).save(os.path.join(d, f"{i:05d}.jpg"), quality=92)
    return root


def _on_tpu():
    import jax

    return jax.devices()[0].platform != "cpu"


def build_config(image_root, workroot, max_steps, batch):
    if not _on_tpu():  # CPU smoke geometry
        denoiser_args = {
            "in_channels": 3, "patch_size": 8, "num_groups": 4,
            "hidden_size": 64, "hidden_size_x": 16, "num_blocks": 4,
            "num_cond_blocks": 2, "num_classes": 1000,
        }
        resolution = 32
    else:
        denoiser_args = {
            "in_channels": 3, "patch_size": 16, "num_groups": 16,
            "hidden_size": 1152, "hidden_size_x": 64,
            "num_blocks": 28, "num_cond_blocks": 22,
            "num_classes": 1000, "grad_checkpoint": True,
        }
        resolution = 256
    return {
        "seed_everything": True,
        "tags": {"exp": f"fit_async_{max_steps}"},
        "trainer": {
            "default_root_dir": workroot,
            "max_steps": max_steps,
            "log_every_n_steps": 10_000,  # keep the logger out of the timing
            "callbacks": [
                {"class_path": "src.callbacks.model_checkpoint.CheckpointHook",
                 "init_args": {"every_n_train_steps": 100_000}},
            ],
        },
        "model": {
            "vae": {"class_path": "src.models.autoencoder.pixel.PixelAE",
                    "init_args": {"scale": 1.0}},
            "denoiser": {
                "class_path": "src.models.transformer.dit_c2i_DeCo.PixNerDiT",
                "init_args": denoiser_args,
            },
            "conditioner": {
                "class_path":
                    "src.models.conditioner.class_label.LabelConditioner",
                "init_args": {"num_classes": 1000},
            },
            "diffusion_trainer": {
                "class_path":
                    "src.diffusion.flow_matching.training_repa_DeCo.REPATrainer",
                "init_args": {
                    "lognorm_t": True,
                    "scheduler":
                        "src.diffusion.flow_matching.scheduling.LinearScheduler",
                },
            },
            "diffusion_sampler": {
                "class_path": "src.diffusion.flow_matching.sampling.EulerSampler",
                "init_args": {
                    "num_steps": 4, "guidance": 1.0,
                    "scheduler":
                        "src.diffusion.flow_matching.scheduling.LinearScheduler",
                },
            },
            "ema_tracker": {"class_path": "src.callbacks.simple_ema.SimpleEMA",
                            "init_args": {"decay": 0.9999}},
            "optimizer": {"class_path": "torch.optim.AdamW",
                          "init_args": {"lr": 1e-4, "weight_decay": 0.0}},
        },
        "data": {
            "train_dataset": {
                "class_path": "src.data.dataset.imagenet.PixImageNet",
                "init_args": {"root": image_root, "resolution": resolution},
            },
            "train_batch_size": batch,
            "train_num_workers": 2,
        },
    }


def timed_fit(image_root, max_steps, batch):
    from deco_tpu.train.loop import Experiment

    workroot = tempfile.mkdtemp(prefix="fitbench_wd_")
    try:
        exp = Experiment(build_config(image_root, workroot, max_steps, batch))
        t0 = time.perf_counter()
        state = exp.fit()
        dt = time.perf_counter() - t0
        assert int(state.step) == max_steps
        return dt
    finally:
        shutil.rmtree(workroot, ignore_errors=True)


def main(steps_long=16, batch=24):
    from deco_tpu.train.loop import Experiment

    image_root = make_jpeg_root()
    steps_short = max(2, steps_long // 4)
    results = {}
    try:
        for runahead in (0, 2):
            Experiment._TRAIN_RUNAHEAD = runahead
            timed_fit(image_root, steps_short, batch)  # warmup: compile etc.
            t_short = timed_fit(image_root, steps_short, batch)
            t_long = timed_fit(image_root, steps_long, batch)
            rate = (steps_long - steps_short) * batch / (t_long - t_short)
            results[runahead] = rate
            print(f"# runahead={runahead}: short({steps_short})={t_short:.1f}s "
                  f"long({steps_long})={t_long:.1f}s -> steady-state "
                  f"{rate:.1f} img/s", file=sys.stderr)
    finally:
        shutil.rmtree(image_root, ignore_errors=True)

    base, piped = results[0], results[2]
    print(f"bench_fit_async: serial {base:.1f} img/s vs runahead-2 "
          f"{piped:.1f} img/s ({(piped / base - 1) * 100:+.1f}%) "
          f"[DeCo-XL 256px b{batch}, freq loss, adamw+EMA, full remat, "
          f"real-JPEG loader]")


if __name__ == "__main__":
    s = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    main(s, b)
