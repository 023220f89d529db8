"""Golden parity for the t2i trunk: converted torch PixNerd-t2i weights
reproduce the reference forward (joint attention, text refine, NerfBlocks)."""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not available"
)


@pytest.fixture(scope="module")
def ref_module():
    torch = pytest.importorskip("torch")
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from src.models.transformer import dit_t2i_pixnerd  # noqa: E402

    return dit_t2i_pixnerd


def test_pixnerd_t2i_forward_parity(ref_module):
    import torch

    import jax.numpy as jnp

    from deco_tpu.convert.torch_to_flax import convert_deco_t2i
    from deco_tpu.models.dit_t2i import PixNerdT2I

    kw = dict(in_channels=3, patch_size=4, num_groups=2, hidden_size=32,
              decoder_hidden_size=8, num_encoder_blocks=2, num_decoder_blocks=2,
              num_text_blocks=1, txt_embed_dim=16, txt_max_length=6)
    tmodel = ref_module.PixNerDiT(**kw).eval()
    g = torch.Generator().manual_seed(0)
    for p in tmodel.parameters():
        with torch.no_grad():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 16, 16).astype(np.float32)
    t = np.asarray([0.2, 0.7], np.float32)
    y = rng.randn(2, 6, 16).astype(np.float32)
    with torch.no_grad():
        out_t = tmodel(
            torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(y)
        ).numpy()

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params = convert_deco_t2i(
        sd, in_channels=3, patch_size=4, num_encoder_blocks=2,
        num_text_blocks=1, pixnerd=True,
    )
    jmodel = PixNerdT2I(**kw, nerf_mlpratio=2, dtype=jnp.float32)
    out_j = jmodel.apply(
        {"params": params},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(t),
        jnp.asarray(y),
    )
    np.testing.assert_allclose(
        np.asarray(out_j).transpose(0, 3, 1, 2), out_t, atol=5e-4, rtol=1e-3
    )
