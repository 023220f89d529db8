"""Raw int8-vs-bf16 matmul probe on the real chip.

Decides whether int8 quantization of the DiT trunk matmuls is worth plumbing:
v5e's MXU peaks at 394 TOPS int8 vs 197 TFLOPS bf16. Measures a chained
lax.scan of GEMMs at DeCo-XL trunk shapes (rows = B*2*256 CFG tokens) with a
serializing carry + final readback (the relay elides un-consumed dispatches —
CLAUDE.md bench protocol).

Usage: python scripts/bench_int8_probe.py [rows] [iters]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

rows = int(sys.argv[1]) if len(sys.argv) > 1 else 40 * 256
iters = int(sys.argv[2]) if len(sys.argv) > 2 else 64
cin, cout = 1152, 3 * 1152

key = jax.random.PRNGKey(0)
kx, kw = jax.random.split(key)
x0 = jax.random.normal(kx, (rows, cin), jnp.bfloat16)
w = jax.random.normal(kw, (cin, cout), jnp.bfloat16) * 0.02


def chain_bf16(x0, w):
    def body(x, _):
        y = jnp.dot(x, w, preferred_element_type=jnp.float32)
        s = jnp.tanh(jnp.sum(y) * 1e-6) * 1e-6
        return x0 * (1 + s).astype(jnp.bfloat16), None

    x, _ = jax.lax.scan(body, x0, None, length=iters)
    return jnp.sum(x.astype(jnp.float32))


def quant_rows(x):
    s = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-8)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
    return q, s


def chain_int8(x0, w):
    # weight quantized once (loop-invariant; XLA hoists it)
    ws = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0, keepdims=True) / 127.0
    ws = jnp.maximum(ws, 1e-8)
    wq = jnp.clip(jnp.round(w.astype(jnp.float32) / ws), -127, 127).astype(jnp.int8)

    def body(x, _):
        xq, xs = quant_rows(x)
        y = jax.lax.dot_general(
            xq, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        y = y.astype(jnp.float32) * xs * ws
        s = jnp.tanh(jnp.sum(y) * 1e-6) * 1e-6
        return x0 * (1 + s).astype(jnp.bfloat16), None

    x, _ = jax.lax.scan(body, x0, None, length=iters)
    return jnp.sum(x.astype(jnp.float32))


flops = 2 * rows * cin * cout * iters
for name, fn in [("bf16", chain_bf16), ("int8", chain_int8)]:
    f = jax.jit(fn)
    t0 = time.perf_counter()
    float(f(x0, w))  # compile + first run
    print(f"{name}: compile+first {time.perf_counter()-t0:.2f}s")
    times = []
    for i in range(3):
        xi = x0 * (1.0 + 0.001 * i)
        t0 = time.perf_counter()
        float(f(xi, w))
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(
        f"{name}: rows={rows} iters={iters} best {best*1e3:.1f} ms "
        f"= {flops/best/1e12:.1f} TFLOP/s  (all: {[f'{t*1e3:.1f}' for t in times]})"
    )
