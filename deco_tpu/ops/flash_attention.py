"""Fused Pallas attention for DiT/ViT blocks.

TPU-native replacement for the reference's SDPA / flash_attn usage (SURVEY
§2.9: ``src/models/layers/attention_op.py:4``, ``src/models/uniflow/
flash_attention.py:17``): a flash-style forward kernel with online softmax
sized for the DeCo sequence regime (256-4k tokens, head_dim 64-128).

Design notes (see /opt/skills/guides/pallas_guide.md):

- Grid is (batch*heads, num_q_blocks); each program streams KV blocks through
  VMEM with fp32 running-max/sum accumulators — logits never hit HBM.
- Head dim is zero-padded to the 128-lane boundary once at the wrapper level
  (DeCo-XL uses head_dim 72); zero columns are exact no-ops for qk^T and pv.
- Backward is a pair of Pallas kernels (dq over q blocks; dk/dv over kv
  blocks) that recompute probabilities from the forward-saved logsumexp —
  O(N^2) flops, but probabilities never hit HBM in either direction, which is
  what unlocks 512px (1024-token) training batches (the old XLA bwd
  materialized 4 fp32 (BH, N, N) tensors). ``DECO_FLASH_BWD=xla`` forces the
  reference XLA backward for A/B and parity testing.

``flash_attention(q, k, v)`` takes (B, N, H, D) and returns (B, N, H, D);
``use_flash=True`` on the model layers routes through here, the default XLA
path stays in :func:`deco_tpu.models.layers.sdpa`.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name as _checkpoint_name
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# The resident kernels below keep the full KV (or full Q for dk/dv) in VMEM
# and stream blocks out of it with pl.ds — the fastest layout for the DeCo
# regimes (256-8k tokens; measured 27% over XLA at 4096-token bwd). Past
# ~8k tokens the double-buffered resident tensors blow the ~16MB scoped VMEM
# limit (measured: 16,384 tokens x 128 lanes x bf16 x (k+v) x 2 buffers =
# 16.25M > 16.00M), so longer sequences dispatch to the *streaming* kernels:
# the KV (or Q) axis moves into the grid's innermost "arbitrary" dimension
# and the online-softmax state lives in fp32 VMEM scratch that persists
# across grid steps — VMEM use is then constant in N. Equivalence is tested
# in interpret mode (tests/test_ops.py::TestFlashStreaming).
_RESIDENT_VMEM_BUDGET = 8 * 1024 * 1024


def _stream_resident(n, d, itemsize):
    """True when a resident (1, n, d) KV/Q pair would exceed the VMEM budget
    (2 tensors x 2 pipeline buffers)."""
    return n * d * itemsize * 4 > _RESIDENT_VMEM_BUDGET


_STREAM_SEMANTICS = pltpu.CompilerParams(
    dimension_semantics=("parallel", "parallel", "arbitrary")
)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, block_k, kv_len):
    """One program: a GROUP of (batch*head) planes, one q block each.

    q_ref/o_ref: (G, BQ, D); k_ref/v_ref: (G, N, D) resident. The static
    per-plane loop amortizes fixed per-program cost (grid sequencing, DMA
    issue latency) over G planes — at the DeCo-XL headline shape (N=256,
    640 (b,h) planes) one-plane programs left the kernel ~3x off its
    roofline (in-context ablation, scripts/bench_ablate.py). Leading-axis
    indexing keeps every operand a dense tile-aligned (rows, D) vector —
    the layout Mosaic lowers without relayouts (slicing a middle axis of a
    4D block is an unsupported shape cast as of this writing).

    Matmuls run at native input precision (bf16 on the MXU at full rate) with
    fp32 accumulation — SDPA semantics; softmax statistics stay fp32.
    """
    num_kv = kv_len // block_k
    for gg in range(q_ref.shape[0]):
        q = q_ref[gg]  # (BQ, D), input dtype
        bq, d = q.shape

        def body(i, carry):
            m_prev, l_prev, acc = carry
            k = k_ref[gg, pl.ds(i * block_k, block_k), :]
            v = v_ref[gg, pl.ds(i * block_k, block_k), :]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # (BQ, BK) fp32
            m_cur = jnp.max(s, axis=-1)
            m_new = jnp.maximum(m_prev, m_cur)
            p = jnp.exp(s - m_new[:, None])
            correction = jnp.exp(m_prev - m_new)
            l_new = l_prev * correction + jnp.sum(p, axis=-1)
            acc = acc * correction[:, None] + jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return m_new, l_new, acc

        m0 = jnp.full((bq,), NEG_INF, jnp.float32)
        l0 = jnp.zeros((bq,), jnp.float32)
        acc0 = jnp.zeros((bq, d), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, num_kv, body, (m0, l0, acc0))
        o_ref[gg] = (acc / l[:, None]).astype(o_ref.dtype)


def _fwd_kernel_stream(q_ref, k_ref, v_ref, o_ref, m_sc, l_sc, acc_sc, *,
                       scale, num_kv, lse_ref=None):
    """Streaming forward: one grid step = one (q block, kv block) pair.

    The kv-block axis is the innermost ("arbitrary") grid dimension; the
    online-softmax state (m, l, acc) persists in fp32 VMEM scratch across kv
    steps. m/l are stored lane-replicated at (BQ, 128) per the TPU scratch
    tiling rules.
    """
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        m_sc[...] = jnp.full(m_sc.shape, NEG_INF, jnp.float32)
        l_sc[...] = jnp.zeros(l_sc.shape, jnp.float32)
        acc_sc[...] = jnp.zeros(acc_sc.shape, jnp.float32)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                                            # (BQ, BK) fp32
    m_prev = m_sc[...]                                   # (BQ, 128) replicated
    l_prev = l_sc[...]
    m_cur = jnp.max(s, axis=-1, keepdims=True)           # (BQ, 1)
    m_new = jnp.maximum(m_prev, m_cur)                   # (BQ, 128)
    p = jnp.exp(s - m_new[:, :1])
    correction = jnp.exp(m_prev - m_new)
    l_sc[...] = l_prev * correction + jnp.sum(p, axis=-1, keepdims=True)
    acc_sc[...] = acc_sc[...] * correction[:, :1] + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_sc[...] = m_new

    @pl.when(j == num_kv - 1)
    def _finalize():
        o_ref[0] = (acc_sc[...] / l_sc[:, :1]).astype(o_ref.dtype)
        if lse_ref is not None:
            lse_ref[0, 0] = m_sc[:, 0] + jnp.log(l_sc[:, 0])


def _fwd_kernel_stream_lse(q_ref, k_ref, v_ref, o_ref, lse_ref, m_sc, l_sc,
                           acc_sc, *, scale, num_kv):
    _fwd_kernel_stream(q_ref, k_ref, v_ref, o_ref, m_sc, l_sc, acc_sc,
                       scale=scale, num_kv=num_kv, lse_ref=lse_ref)


def _flash_fwd_stream(q, k, v, scale, want_lse):
    bh, n_q, d = q.shape
    n_kv = k.shape[1]
    block_q, block_k = _pick_blocks(n_q, n_kv)
    grid = (bh, n_q // block_q, n_kv // block_k)
    qo_spec = pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                           memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0),
                           memory_space=pltpu.VMEM)
    scratch = [
        pltpu.VMEM((block_q, 128), jnp.float32),   # m (lane-replicated)
        pltpu.VMEM((block_q, 128), jnp.float32),   # l
        pltpu.VMEM((block_q, d), jnp.float32),     # acc
    ]
    if want_lse:
        return pl.pallas_call(
            functools.partial(_fwd_kernel_stream_lse, scale=scale,
                              num_kv=n_kv // block_k),
            grid=grid,
            in_specs=[qo_spec, kv_spec, kv_spec],
            out_specs=[
                qo_spec,
                pl.BlockSpec((1, 1, block_q), lambda b, i, j: (b, 0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bh, n_q, d), q.dtype),
                jax.ShapeDtypeStruct((bh, 1, n_q), jnp.float32),
            ],
            scratch_shapes=scratch,
            compiler_params=_STREAM_SEMANTICS,
        )(q, k, v)
    return pl.pallas_call(
        functools.partial(_fwd_kernel_stream, scale=scale,
                          num_kv=n_kv // block_k),
        grid=grid,
        in_specs=[qo_spec, kv_spec, kv_spec],
        out_specs=qo_spec,
        out_shape=jax.ShapeDtypeStruct((bh, n_q, d), q.dtype),
        scratch_shapes=scratch,
        compiler_params=_STREAM_SEMANTICS,
    )(q, k, v)


def _pick_blocks(n_q, n_kv):
    block_q = min(n_q, 512)
    while n_q % block_q:
        block_q //= 2
    block_k = min(n_kv, 512)
    while n_kv % block_k:
        block_k //= 2
    return max(block_q, 8), max(block_k, 8)


def _pick_group(bh, rows, d, itemsize):
    """Number of (batch*head) planes per program for the resident kernels.

    Attention has zero cross-plane data reuse, so grouping exists purely to
    amortize fixed per-program overhead: at the DeCo-XL headline shape the
    one-plane forward grid was 640 programs of ~30 MFLOP each and the whole
    attention math measured ~12 TFLOP/s effective (6% of peak) while the
    neighbouring SwiGLU GEMMs ran at 98% (scripts/bench_ablate.py; grouping
    recovered +6% end-to-end). ``rows`` is the total of all operand block
    row-counts for ONE plane (e.g. forward: 2*n_kv + 2*block_q); picks the
    largest divisor of ``bh`` (capped at 16) whose double-buffered blocks
    fit the VMEM budget. DECO_FLASH_GROUP forces a value (must divide B*H;
    1 reproduces the ungrouped layout for A/B).
    """
    import os

    forced = os.environ.get("DECO_FLASH_GROUP")
    if forced:
        g = int(forced)
        return g if bh % g == 0 else 1
    d_eff = -(-d // 128) * 128  # VMEM lanes round up to the 128 boundary
    for g in range(min(bh, 16), 1, -1):
        vmem = 2 * itemsize * d_eff * g * rows
        if bh % g == 0 and vmem <= _RESIDENT_VMEM_BUDGET:
            return g
    return 1


def _flash_fwd(q, k, v, scale):
    """q/k/v: (BH, N, D) -> o. D needs no lane alignment (VMEM pads lanes)."""
    bh, n_q, d = q.shape
    n_kv = k.shape[1]
    if _stream_resident(n_kv, d, q.dtype.itemsize):
        return _flash_fwd_stream(q, k, v, scale, want_lse=False)
    block_q, block_k = _pick_blocks(n_q, n_kv)
    g = _pick_group(bh, 2 * n_kv + 2 * block_q, d, q.dtype.itemsize)
    grid = (bh // g, n_q // block_q)
    kernel = functools.partial(
        _fwd_kernel, scale=scale, block_k=block_k, kv_len=n_kv
    )
    o = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((g, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, n_kv, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, n_kv, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, block_q, d), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, n_q, d), q.dtype),
    )(q, k, v)
    return o


def _fwd_kernel_lse(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, block_k,
                    kv_len):
    """Forward that also writes the logsumexp row stats for the backward."""
    num_kv = kv_len // block_k
    for gg in range(q_ref.shape[0]):
        q = q_ref[gg]
        bq, d = q.shape

        def body(i, carry):
            m_prev, l_prev, acc = carry
            k = k_ref[gg, pl.ds(i * block_k, block_k), :]
            v = v_ref[gg, pl.ds(i * block_k, block_k), :]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            m_cur = jnp.max(s, axis=-1)
            m_new = jnp.maximum(m_prev, m_cur)
            p = jnp.exp(s - m_new[:, None])
            correction = jnp.exp(m_prev - m_new)
            l_new = l_prev * correction + jnp.sum(p, axis=-1)
            acc = acc * correction[:, None] + jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return m_new, l_new, acc

        m0 = jnp.full((bq,), NEG_INF, jnp.float32)
        l0 = jnp.zeros((bq,), jnp.float32)
        acc0 = jnp.zeros((bq, d), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, num_kv, body, (m0, l0, acc0))
        o_ref[gg] = (acc / l[:, None]).astype(o_ref.dtype)
        # lse rides as (BH, 1, N): TPU blocks need (÷8|==dim, ÷128|==dim) in
        # the last two axes, which (1, block_q) on a (BH, N) array violates
        lse_ref[gg, 0] = m + jnp.log(l)


def _flash_fwd_lse(q, k, v, scale):
    """Like :func:`_flash_fwd` but returns (o, lse) for the backward."""
    bh, n_q, d = q.shape
    n_kv = k.shape[1]
    if _stream_resident(n_kv, d, q.dtype.itemsize):
        return _flash_fwd_stream(q, k, v, scale, want_lse=True)
    block_q, block_k = _pick_blocks(n_q, n_kv)
    g = _pick_group(bh, 2 * n_kv + 2 * block_q, d, q.dtype.itemsize)
    grid = (bh // g, n_q // block_q)
    kernel = functools.partial(
        _fwd_kernel_lse, scale=scale, block_k=block_k, kv_len=n_kv
    )
    o, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((g, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, n_kv, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, n_kv, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((g, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, 1, block_q), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n_q, d), q.dtype),
            jax.ShapeDtypeStruct((bh, 1, n_q), jnp.float32),
        ],
    )(q, k, v)
    return o, lse


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, *,
                   scale, block_k, kv_len):
    """One program: the dq of a group of planes, one q block each, streaming
    KV blocks (same grouping rationale as _fwd_kernel)."""
    num_kv = kv_len // block_k
    for gg in range(q_ref.shape[0]):
        q = q_ref[gg]                      # (BQ, D)
        do = do_ref[gg]                    # (BQ, D)
        lse = lse_ref[gg, 0]               # (BQ,) fp32
        delta = delta_ref[gg, 0]           # (BQ,) fp32
        bq, d = q.shape

        def body(i, acc):
            k = k_ref[gg, pl.ds(i * block_k, block_k), :]
            v = v_ref[gg, pl.ds(i * block_k, block_k), :]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale                                        # (BQ, BK)
            p = jnp.exp(s - lse[:, None])
            dp = jax.lax.dot_general(
                do, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                                # (BQ, BK)
            ds = (p * (dp - delta[:, None])).astype(k.dtype)
            return acc + jax.lax.dot_general(
                ds, k, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        acc = jax.lax.fori_loop(0, num_kv, body,
                                jnp.zeros((bq, d), jnp.float32))
        dq_ref[gg] = (acc * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref,
                    dv_ref, *, scale, block_q, q_len):
    """One program: the dk/dv of a group of planes, one kv block each,
    streaming q blocks."""
    num_q = q_len // block_q
    for gg in range(k_ref.shape[0]):
        k = k_ref[gg]                      # (BK, D)
        v = v_ref[gg]
        bk, d = k.shape

        def body(i, carry):
            dk_acc, dv_acc = carry
            q = q_ref[gg, pl.ds(i * block_q, block_q), :]
            do = do_ref[gg, pl.ds(i * block_q, block_q), :]
            lse = lse_ref[gg, 0, pl.ds(i * block_q, block_q)]
            delta = delta_ref[gg, 0, pl.ds(i * block_q, block_q)]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale                                        # (BQ, BK)
            p = jnp.exp(s - lse[:, None])
            dv_acc = dv_acc + jax.lax.dot_general(
                p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                                # (BK, D)
            dp = jax.lax.dot_general(
                do, v, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                                # (BQ, BK)
            ds = (p * (dp - delta[:, None])).astype(q.dtype)
            dk_acc = dk_acc + jax.lax.dot_general(
                ds, q, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                                # (BK, D)
            return dk_acc, dv_acc

        zero = jnp.zeros((bk, d), jnp.float32)
        dk, dv = jax.lax.fori_loop(0, num_q, body, (zero, zero))
        dk_ref[gg] = (dk * scale).astype(dk_ref.dtype)
        dv_ref[gg] = dv.astype(dv_ref.dtype)


def _bwd_dq_kernel_stream(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                          dq_ref, acc_sc, *, scale, num_kv):
    """Streaming dq: kv blocks ride the innermost grid dim; dq accumulates in
    fp32 scratch across them."""
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        acc_sc[...] = jnp.zeros(acc_sc.shape, jnp.float32)

    q = q_ref[0]
    do = do_ref[0]
    lse = lse_ref[0, 0]
    delta = delta_ref[0, 0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    p = jnp.exp(s - lse[:, None])
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = (p * (dp - delta[:, None])).astype(k.dtype)
    acc_sc[...] = acc_sc[...] + jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(j == num_kv - 1)
    def _finalize():
        dq_ref[0] = (acc_sc[...] * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel_stream(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                           dk_ref, dv_ref, dk_sc, dv_sc, *, scale, num_q):
    """Streaming dk/dv: q blocks ride the innermost grid dim."""
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        dk_sc[...] = jnp.zeros(dk_sc.shape, jnp.float32)
        dv_sc[...] = jnp.zeros(dv_sc.shape, jnp.float32)

    k = k_ref[0]
    v = v_ref[0]
    q = q_ref[0]
    do = do_ref[0]
    lse = lse_ref[0, 0]
    delta = delta_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                                            # (BQ, BK)
    p = jnp.exp(s - lse[:, None])
    dv_sc[...] = dv_sc[...] + jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = (p * (dp - delta[:, None])).astype(q.dtype)
    dk_sc[...] = dk_sc[...] + jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(j == num_q - 1)
    def _finalize():
        dk_ref[0] = (dk_sc[...] * scale).astype(dk_ref.dtype)
        dv_ref[0] = dv_sc[...].astype(dv_ref.dtype)


def _flash_bwd_pallas_stream(q, k, v, do, lse, delta, scale):
    bh, n_q, d = q.shape
    n_kv = k.shape[1]
    block_q, block_k = _pick_blocks(n_q, n_kv)
    q_spec = pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                          memory_space=pltpu.VMEM)
    q_inner = pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, j, 0),
                           memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, i, 0),
                           memory_space=pltpu.VMEM)
    kv_inner = pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0),
                            memory_space=pltpu.VMEM)
    row_outer = pl.BlockSpec((1, 1, block_q), lambda b, i, j: (b, 0, i),
                             memory_space=pltpu.VMEM)
    row_inner = pl.BlockSpec((1, 1, block_q), lambda b, i, j: (b, 0, j),
                             memory_space=pltpu.VMEM)
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel_stream, scale=scale,
                          num_kv=n_kv // block_k),
        grid=(bh, n_q // block_q, n_kv // block_k),
        in_specs=[q_spec, kv_inner, kv_inner, q_spec, row_outer, row_outer],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((bh, n_q, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=_STREAM_SEMANTICS,
    )(q, k, v, do, lse, delta)
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel_stream, scale=scale,
                          num_q=n_q // block_q),
        grid=(bh, n_kv // block_k, n_q // block_q),
        in_specs=[q_inner, kv_spec, kv_spec, q_inner, row_inner, row_inner],
        out_specs=[kv_spec, kv_spec],
        out_shape=[jax.ShapeDtypeStruct((bh, n_kv, d), k.dtype),
                   jax.ShapeDtypeStruct((bh, n_kv, d), v.dtype)],
        scratch_shapes=[pltpu.VMEM((block_k, d), jnp.float32),
                        pltpu.VMEM((block_k, d), jnp.float32)],
        compiler_params=_STREAM_SEMANTICS,
    )(q, k, v, do, lse, delta)
    return dq, dk, dv


def _flash_bwd_pallas(q, k, v, do, lse, delta, scale):
    bh, n_q, d = q.shape
    n_kv = k.shape[1]
    if (_stream_resident(n_kv, d, q.dtype.itemsize)
            or _stream_resident(n_q, d, q.dtype.itemsize)):
        return _flash_bwd_pallas_stream(q, k, v, do, lse, delta, scale)
    block_q, block_k = _pick_blocks(n_q, n_kv)
    g_dq = _pick_group(bh, 2 * n_kv + 3 * block_q, d, q.dtype.itemsize)
    g_kv = _pick_group(bh, 2 * n_q + 4 * block_k, d, q.dtype.itemsize)
    qkv_spec = lambda g, blk: pl.BlockSpec((g, blk, d), lambda b, i: (b, i, 0),
                                           memory_space=pltpu.VMEM)
    full = lambda g, n: pl.BlockSpec((g, n, d), lambda b, i: (b, 0, 0),
                                     memory_space=pltpu.VMEM)
    # lse/delta ride as (BH, 1, N) rows (TPU block-shape constraints)
    row = lambda g, n: pl.BlockSpec((g, 1, n), lambda b, i: (b, 0, 0),
                                    memory_space=pltpu.VMEM)
    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, block_k=block_k,
                          kv_len=n_kv),
        grid=(bh // g_dq, n_q // block_q),
        in_specs=[qkv_spec(g_dq, block_q), full(g_dq, n_kv), full(g_dq, n_kv),
                  qkv_spec(g_dq, block_q),
                  pl.BlockSpec((g_dq, 1, block_q), lambda b, i: (b, 0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((g_dq, 1, block_q), lambda b, i: (b, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=qkv_spec(g_dq, block_q),
        out_shape=jax.ShapeDtypeStruct((bh, n_q, d), q.dtype),
    )(q, k, v, do, lse, delta)
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, block_q=block_q,
                          q_len=n_q),
        grid=(bh // g_kv, n_kv // block_k),
        in_specs=[full(g_kv, n_q), qkv_spec(g_kv, block_k),
                  qkv_spec(g_kv, block_k), full(g_kv, n_q),
                  row(g_kv, n_q), row(g_kv, n_q)],
        out_specs=[qkv_spec(g_kv, block_k), qkv_spec(g_kv, block_k)],
        out_shape=[jax.ShapeDtypeStruct((bh, n_kv, d), k.dtype),
                   jax.ShapeDtypeStruct((bh, n_kv, d), v.dtype)],
    )(q, k, v, do, lse, delta)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_core(q, k, v, scale):
    return _flash_fwd(q, k, v, scale)


def _flash_core_fwd(q, k, v, scale):
    o, lse = _flash_fwd_lse(q, k, v, scale)
    # checkpoint_name tags let the selective "attn" remat policy
    # (save_only_these_names — dit_c2i_deco.run_dit_blocks) keep o and lse
    # across the backward so the flash forward is NOT rerun during block
    # recompute; q/k/v are recomputed from the (cheap) projections instead.
    o = _checkpoint_name(o, "attn_out")
    lse = _checkpoint_name(lse, "attn_lse")
    return o, (q, k, v, o, lse)


def _flash_core_bwd_xla(scale, res, do):
    """Reference XLA backward (materializes O(N^2) probabilities; kept for
    parity testing and DECO_FLASH_BWD=xla A/B)."""
    q, k, v, o, lse = res
    lse = lse[:, 0, :]  # (BH, 1, N) -> (BH, N)
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    dof = do.astype(jnp.float32)
    s = jnp.einsum("bqd,bkd->bqk", qf * scale, kf)
    p = jnp.exp(s - lse[:, :, None])
    dv = jnp.einsum("bqk,bqd->bkd", p, dof)
    dp = jnp.einsum("bqd,bkd->bqk", dof, vf)
    delta = jnp.sum(dof * o.astype(jnp.float32), axis=-1)  # (B, Q)
    ds = p * (dp - delta[:, :, None])
    dq = jnp.einsum("bqk,bkd->bqd", ds, kf) * scale
    dk = jnp.einsum("bqk,bqd->bkd", ds, qf) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


def _flash_core_bwd(scale, res, do):
    import os

    # default: Pallas kernels on accelerators, XLA on CPU (where Pallas only
    # exists under interpret mode); DECO_FLASH_BWD=xla|pallas forces either.
    impl = os.environ.get("DECO_FLASH_BWD")
    if impl is None:
        impl = "xla" if jax.default_backend() == "cpu" else "pallas"
    if impl == "xla":
        return _flash_core_bwd_xla(scale, res, do)
    q, k, v, o, lse = res
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1)[:, None, :]  # (BH, 1, N) like lse
    return _flash_bwd_pallas(q, k, v, do, lse, delta, scale)


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


def flash_attention(q, k, v, scale: float | None = None):
    """Fused attention. q: (B, Nq, H, D); k/v: (B, Nkv, H, D). Non-causal.

    Returns (B, Nq, H, D) in q's dtype. Operands fold to (B*H, N, D); D
    stays at its TRUE size by default — Mosaic pads the VMEM lane tiles
    internally, so zero-padding D to 128 in HBM (the pre-round-5 layout)
    only added +78% DMA bytes and two extra HBM copies per operand on
    DeCo's 72-wide heads. DECO_FLASH_PAD=1 restores the padded layout
    for A/B. (A head-major caller layout that makes this fold a free
    reshape measured NO further win — see models/layers.RAttention.)
    """
    import os

    b, n_q, h, d = q.shape
    n_kv = k.shape[1]
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if n_q % 8 or n_kv % 8:
        # Mosaic requires sublane-divisible (8) sequence blocks; tiny/ragged
        # sequences (e.g. a 2x2+cls ViT probe = 5 tokens) take the XLA fused
        # path — at these sizes the kernel has no advantage anyway
        return jax.nn.dot_product_attention(q, k, v, scale=scale)
    d_pad = -d % 128 if os.environ.get("DECO_FLASH_PAD") == "1" else 0
    if d_pad:
        pad = lambda x: jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, d_pad)))
        q, k, v = pad(q), pad(k), pad(v)
    dp = d + d_pad

    def fold(x, n):
        return x.transpose(0, 2, 1, 3).reshape(b * h, n, dp)

    o = _flash_core(fold(q, n_q), fold(k, n_kv), fold(v, n_kv), scale)
    o = o.reshape(b, h, n_q, dp).transpose(0, 2, 1, 3)
    return o[..., :d]
