"""Software-pipelined device→host prediction driver.

JAX dispatch is asynchronous: a jitted call returns device arrays immediately
while the chip keeps executing. The reference predict loops serialize device
compute with host work — blocking readback, PNG/npz accumulation, next-batch
noise synthesis (``src/lightning_model.py:261-316`` +
``src/callbacks/save_images.py:44-59`` of hhhhzp/DeCo run strictly
batch-by-batch under Lightning) — so the accelerator idles for the host
portion of every batch. :func:`pipelined_map` keeps up to ``depth`` batches
in flight: the host consumes batch ``k`` (readback + hooks) while the device
executes batch ``k+1``.

Used by ``Experiment.predict`` (deco_tpu/train/loop.py) and the protocol
rehearsal scripts. On the FID-protocol path the host share (seeded-noise
synthesis, uint8 readback over the relay, npz accumulation) is what separated
2.23 img/s pure sampling from 1.84 img/s sustained in round 3.
"""

from __future__ import annotations

from collections import deque
from typing import Any, Callable, Iterable


def pipelined_map(
    batches: Iterable[Any],
    dispatch: Callable[[Any], Any],
    consume: Callable[[Any, Any], None],
    depth: int = 1,
) -> int:
    """Run ``consume(dispatch(b), b)`` over ``batches`` with overlap.

    ``dispatch`` should only *issue* device work (jitted calls, device puts)
    and return promptly — with JAX's async dispatch that is the default for
    jitted functions. ``consume`` does the blocking host work
    (``jax.device_get`` + hooks). Up to ``depth`` dispatched batches are kept
    in flight before the oldest is consumed; ``depth=0`` degrades to the
    serial loop (dispatch then immediately consume — the A/B baseline).

    Returns the number of batches processed, in batch order. If ``dispatch``
    (or the ``batches`` iterator) raises, every already-dispatched batch is
    consumed first — completed device work is never dropped — then the error
    propagates. ``consume`` errors propagate immediately.
    """
    if depth < 0:
        raise ValueError(f"depth must be >= 0, got {depth}")
    inflight: deque = deque()
    n = 0

    def drain(limit: int) -> None:
        nonlocal n
        while len(inflight) > limit:
            out, bb = inflight.popleft()
            consume(out, bb)
            n += 1

    it = iter(batches)
    while True:
        try:
            b = next(it)
            inflight.append((dispatch(b), b))
        except StopIteration:
            break
        except BaseException:
            drain(0)
            raise
        drain(depth)
    drain(0)
    return n
