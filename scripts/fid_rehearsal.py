"""Protocol-scale FID pipeline rehearsal (VERDICT r2 item 8).

Runs the EXACT reference FID protocol end-to-end at reduced sample count on
the attached chip: DeCo-XL/16 256px, 100-step Euler, CFG 3.2, guidance
interval (0.1, 1.0] (configs_c2i/DeCo_XL.yaml:74-84 of hhhhzp/DeCo), the
seeded class-conditional noise dataset (1000 classes cycling), SaveImagesHook
``save_compressed`` -> ``output.npz`` with key ``arr_0`` — the ADM suite's
expected artifact (reference src/callbacks/save_images.py:61-66,
README.md:102) — then an in-framework FID between the generated batch and a
synthetic reference set, to exercise the scoring path at scale.

Weights are random (no published checkpoint can enter this zero-egress
environment), so the FID *value* is meaningless — the rehearsal validates the
pipeline mechanics + wall-clock at protocol settings and extrapolates to the
50k-sample run.

Usage: python scripts/fid_rehearsal.py [num_samples=2000] [batch=20] [depth=1]
(depth = software-pipeline depth; 0 = serial baseline for A/B)
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(num_samples=2000, batch=20, workdir="/tmp/fid_rehearsal", depth=1):
    from deco_tpu.data.loader import make_loader
    from deco_tpu.data.randn import ClassLabelRandomNDataset
    from deco_tpu.diffusion.sampling import EulerSampler
    from deco_tpu.diffusion.scheduling import LinearScheduler
    from deco_tpu.models.autoencoders import fp_to_uint8
    from deco_tpu.models.dit_c2i_deco import DeCoC2I
    from deco_tpu.train.hooks import SaveImagesHook

    on_tpu = jax.devices()[0].platform != "cpu"
    size = 256 if on_tpu else 32
    model_kw = dict(
        in_channels=3, patch_size=16, num_groups=16, hidden_size=1152,
        hidden_size_x=32, num_blocks=31, num_cond_blocks=28, num_classes=1000,
    )
    steps = 100
    if not on_tpu:  # CPU smoke config
        model_kw.update(hidden_size=64, num_groups=4, num_blocks=4,
                        num_cond_blocks=2, hidden_size_x=16, patch_size=8)
        steps = 4
    model = DeCoC2I(**model_kw)

    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((batch, size, size, 3), jnp.float32)
    params = jax.jit(model.init)(
        rng, x0, jnp.zeros((batch,)), jnp.zeros((batch,), jnp.int32))

    # EXACT reference sampler protocol
    sampler = EulerSampler(
        scheduler=LinearScheduler(), num_steps=steps, guidance=3.2,
        guidance_interval_min=0.1, guidance_interval_max=1.0,
    )

    @jax.jit
    def sample_u8(params, noise, cond, uncond):
        net = lambda x, t, y: model.apply(params, x, t, y)
        # uint8 conversion fused into the dispatch: one jit call per batch,
        # and readback moves 1/4 the bytes of fp32
        return fp_to_uint8(sampler(net, noise, cond, uncond))

    # the reference FID dataset: per-sample torch.Generator(seed) noise,
    # condition cycling over 1000 classes (src/data/dataset/randn.py:38-91)
    ds = ClassLabelRandomNDataset(
        latent_shape=(3, size, size), num_classes=1000,
        max_num_instances=num_samples,
    )
    loader = make_loader(ds, batch, infinite=False, shuffle=False,
                         num_workers=2, drop_last=False)

    hook = SaveImagesHook(save_dir="fid_samples", save_compressed=True,
                          max_save_images=4)
    hook.on_predict_start(workdir, 0)

    # Software-pipelined device->host loop (utils/pipeline.py): batch k+1 is
    # dispatched before batch k's blocking readback so the chip never idles
    # for npz accumulation / noise synthesis. depth=0 = the serial baseline.
    from deco_tpu.utils.pipeline import pipelined_map

    t_start = time.perf_counter()
    progress = {"n": 0}

    def batches():
        seen = 0
        for noise, label, meta in loader:
            if seen >= num_samples:
                return
            noise = jnp.asarray(np.asarray(noise), jnp.float32)
            cond = jnp.asarray(np.asarray(label), jnp.int32)
            yield noise, cond, jnp.full_like(cond, 1000), meta
            seen += int(cond.shape[0])

    def dispatch(b):
        noise, cond, uncond, _ = b
        return sample_u8(params, noise, cond, uncond)

    def consume(out, b):
        u8 = np.asarray(jax.device_get(out))
        hook.on_predict_batch_end(u8, b[3])
        progress["n"] += u8.shape[0]
        if progress["n"] % (batch * 10) == 0:
            rate = progress["n"] / (time.perf_counter() - t_start)
            print(f"# {progress['n']}/{num_samples} at {rate:.2f} img/s",
                  file=sys.stderr)

    pipelined_map(batches(), dispatch, consume, depth=depth)
    n_done = progress["n"]
    npz_path = hook.on_predict_end()
    elapsed = time.perf_counter() - t_start

    # --- validate the ADM artifact layout at real scale ---
    with np.load(npz_path) as z:
        arr = z["arr_0"]
    assert arr.shape == (n_done, size, size, 3), arr.shape
    assert arr.dtype == np.uint8

    # --- score through the in-framework FID path ---
    t_fid = time.perf_counter()
    from deco_tpu.train.metrics import fid_from_images

    gen01 = arr[: min(n_done, 1024)].astype(np.float32) / 255.0
    ref01 = np.clip(
        gen01 + np.random.RandomState(0).normal(0, 0.05, gen01.shape), 0, 1
    ).astype(np.float32)  # synthetic reference set (no ImageNet in-env)
    fid = fid_from_images(gen01, ref01)
    fid_s = time.perf_counter() - t_fid

    rate = n_done / elapsed
    print(f"fid_rehearsal: {n_done} samples, {steps}-step Euler CFG 3.2 "
          f"interval (0.1,1]: {elapsed:.0f}s = {rate:.2f} img/s/chip; "
          f"npz ok ({arr.shape}); fid(synthetic)={fid:.2f} in {fid_s:.0f}s; "
          f"50k extrapolation = {50000 / rate / 3600:.2f} chip-hours")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    d = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    main(n, b, depth=d)
