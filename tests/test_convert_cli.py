"""Conversion CLI: torch <-> flax roundtrip through the subprocess surface."""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch


def _run(args, check=True):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PYTHONPATH", None)
    env["PYTHONPATH"] = os.getcwd()
    r = subprocess.run([sys.executable, "-m", "deco_tpu.convert", *args],
                       capture_output=True, text=True, env=env, timeout=600)
    if check:
        assert r.returncode == 0, r.stderr[-1500:]
    return r


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    from deco_tpu.convert.flax_to_torch import (
        export_checkpoint,
        save_torch_checkpoint,
    )
    from deco_tpu.models.dit_c2i_deco import DeCoC2I

    root = tmp_path_factory.mktemp("convcli")
    model = DeCoC2I(in_channels=3, patch_size=4, num_groups=2, hidden_size=32,
                    hidden_size_x=8, num_blocks=4, num_cond_blocks=2,
                    num_classes=10)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)),
                   jnp.zeros((1,)), jnp.zeros((1,), jnp.int32))["params"]
    sd = export_checkpoint(v, v, model_kind="deco_c2i", in_channels=3,
                           patch_size=4)
    path = root / "tiny_c2i.pt"
    save_torch_checkpoint(sd, str(path))
    return str(root), str(path)


class TestConvertCLI:
    def test_c2i_roundtrip_identity(self, tiny_ckpt):
        root, ckpt = tiny_ckpt
        mp = os.path.join(root, "p.msgpack")
        ep = os.path.join(root, "e.msgpack")
        back = os.path.join(root, "back.pt")
        _run(["import-torch", ckpt, mp, "--model", "c2i", "--patch-size", "4"])
        _run(["import-torch", ckpt, ep, "--model", "c2i", "--patch-size", "4",
              "--prefix", "ema_denoiser."])
        _run(["export-torch", mp, back, "--model", "c2i", "--patch-size", "4",
              "--ema-src", ep])
        a = torch.load(ckpt, map_location="cpu", weights_only=False)["state_dict"]
        b = torch.load(back, map_location="cpu", weights_only=False)["state_dict"]
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                          err_msg=k)

    def test_wrong_model_gives_named_error(self, tiny_ckpt):
        root, ckpt = tiny_ckpt
        r = _run(["import-torch", ckpt, os.path.join(root, "x.msgpack"),
                  "--model", "uniflow"], check=False)
        assert r.returncode != 0

    def test_missing_subcommand_usage(self):
        r = _run([], check=False)
        assert r.returncode != 0
        assert "import-torch" in (r.stderr + r.stdout)


def test_discriminator_import(tmp_path):
    """The D tower of a reference VAE-GAN checkpoint imports via the CLI."""
    from deco_tpu.models.gan.discriminator import NLayerDiscriminator

    tdisc_sd = {}
    torch.manual_seed(0)
    # build a reference-layout discriminator state dict from our own export
    # surface: conv kernels HWIO -> OIHW under the reference key names
    import jax.numpy as jnp

    jdisc = NLayerDiscriminator(hidden_channels=32, num_stages=2,
                                dtype=jnp.float32)
    p = jdisc.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, 64, 64, 3)))["params"]

    def put(tname, node):
        k = np.asarray(node["conv"]["kernel"]).transpose(3, 2, 0, 1)
        tdisc_sd[tname + ".weight"] = torch.from_numpy(np.ascontiguousarray(k))
        tdisc_sd[tname + ".bias"] = torch.from_numpy(
            np.asarray(node["conv"]["bias"]))

    put("block_in.0", p["block_in"])
    for i in range(2):
        put(f"blocks.{i}.0", p[f"stage_{i}_conv"])
        tdisc_sd[f"blocks.{i}.2.weight"] = torch.from_numpy(
            np.asarray(p[f"stage_{i}_norm"]["scale"]))
        tdisc_sd[f"blocks.{i}.2.bias"] = torch.from_numpy(
            np.asarray(p[f"stage_{i}_norm"]["bias"]))
    put("to_logits.0", p["head_conv1"])
    put("to_logits.2", p["head_conv2"])

    src = tmp_path / "disc.pt"
    torch.save(tdisc_sd, str(src))
    dst = tmp_path / "disc.msgpack"
    r = _run(["import-torch", str(src), str(dst), "--model", "discriminator"])
    assert "discriminator" in r.stdout
    from flax import serialization

    back = serialization.msgpack_restore(open(dst, "rb").read())
    np.testing.assert_array_equal(
        back["block_in"]["conv"]["kernel"], p["block_in"]["conv"]["kernel"])
