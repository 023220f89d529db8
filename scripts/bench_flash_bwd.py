"""Flash-attention BACKWARD A/B at long sequence length (VERDICT r2 item 4).

Trunk-only fwd+bwd at 4096 tokens (the 1024px/p16 regime) — DeCo-XL trunk
geometry (hidden 1152, 16 heads, 28 blocks, full per-block remat), Pallas
backward vs the XLA reference backward (DECO_FLASH_BWD=xla|pallas), wall time
per step + peak device memory. This turns the kernel's "long-sequence
headroom" claim (ops/flash_attention.py module docstring) into a measurement.

The reference's only real kernel dependency exists for exactly this regime
(src/models/uniflow/flash_attention.py:17 of hhhhzp/DeCo).

Usage: DECO_FLASH_BWD=pallas python scripts/bench_flash_bwd.py [tokens] [batch]
Each timed iteration folds the gradient back into the params (state-mutating)
and reads back a scalar, so the relay cannot elide repeats.
"""

# runnable as `python scripts/<name>.py` from anywhere
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class Trunk(nn.Module):
    num_blocks: int = 28
    num_heads: int = 16

    @nn.compact
    def __call__(self, x, c, rope):
        from deco_tpu.models.dit_c2i_deco import run_dit_blocks

        x, _ = run_dit_blocks(
            x, c, rope, None, num_blocks=self.num_blocks,
            num_heads=self.num_heads, grad_checkpoint=True,
        )
        return x


def main(tokens=4096, batch=2, hidden=1152, heads=16, blocks=28, steps=8):
    from deco_tpu.models import layers

    grid = int(round(np.sqrt(tokens)))
    assert grid * grid == tokens
    rope = layers.precompute_rope_2d(hidden // heads, grid, grid)
    model = Trunk(num_blocks=blocks, num_heads=heads)

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (batch, tokens, hidden), jnp.bfloat16)
    c = jax.random.normal(jax.random.fold_in(rng, 1), (batch, 1, hidden),
                          jnp.bfloat16)
    params = jax.jit(model.init)(rng, x, c, rope)

    def loss(p, x):
        out = model.apply(p, x, c, rope)
        return jnp.sum(out.astype(jnp.float32) ** 2) / out.size

    @jax.jit
    def step(p, x):
        l, g = jax.value_and_grad(loss)(p, x)
        # fold the grad into params: state-mutating, elision-proof
        p = jax.tree.map(lambda a, b: a - 1e-6 * b.astype(a.dtype), p, g)
        return p, l

    impl = os.environ.get("DECO_FLASH_BWD", "<default>")
    t0 = time.perf_counter()
    params, l = step(params, x)
    float(l)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(steps):
        params, l = step(params, x)
        float(l)  # per-iter readback fence
    dt = (time.perf_counter() - t0) / steps

    peak = None
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats:
            peak = stats.get("peak_bytes_in_use")
    except Exception:
        pass
    peak_s = f" peak={peak/2**30:.2f}GiB" if peak else ""
    print(f"flash_bwd[{impl}] tokens={tokens} batch={batch} blocks={blocks}: "
          f"{dt*1e3:.1f} ms/step (compile+1st {compile_s:.1f}s){peak_s}")


if __name__ == "__main__":
    tok = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    main(tok, b)
