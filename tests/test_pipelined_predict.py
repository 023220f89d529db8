"""Software-pipelined predict driver (utils/pipeline.py).

The reference predict loop is strictly serial per batch
(src/lightning_model.py:261-316 + src/callbacks/save_images.py:44-59 under
Lightning); deco_tpu overlaps device compute with host readback via
``pipelined_map``. These tests pin the scheduling contract: batch order,
completeness, the dispatch-ahead window, serial degradation at depth=0, and
ordered exception propagation.
"""

import pytest

from deco_tpu.utils.pipeline import pipelined_map


def test_all_batches_in_order():
    events = []
    n = pipelined_map(
        range(7),
        dispatch=lambda b: b * 10,
        consume=lambda out, b: events.append((out, b)),
        depth=2,
    )
    assert n == 7
    assert events == [(b * 10, b) for b in range(7)]


@pytest.mark.parametrize("depth", [0, 1, 3])
def test_dispatch_runs_ahead_by_depth(depth):
    log = []
    pipelined_map(
        range(5),
        dispatch=lambda b: log.append(("d", b)) or b,
        consume=lambda out, b: log.append(("c", b)),
        depth=depth,
    )
    # at any point, dispatches may lead consumes by AT MOST depth+1 and the
    # lead is fully used: before consume(k), dispatch(k+depth) has happened
    # (when that batch exists)
    for k in range(5):
        ci = log.index(("c", k))
        ahead = [e for e in log[:ci] if e[0] == "d"]
        assert len(ahead) <= k + depth + 1
        if k + depth < 5:
            assert ("d", min(k + depth, 4)) in ahead
    # depth=0 is the serial baseline: strict d,c,d,c interleave
    if depth == 0:
        assert log == [e for b in range(5) for e in [("d", b), ("c", b)]]


def test_exception_propagates_in_batch_order():
    consumed = []

    def dispatch(b):
        if b == 3:
            raise RuntimeError("boom at dispatch 3")
        return b

    with pytest.raises(RuntimeError, match="boom at dispatch 3"):
        pipelined_map(range(10), dispatch,
                      lambda out, b: consumed.append(b), depth=1)
    # batches before the failing dispatch were consumed (no loss)
    assert consumed == [0, 1, 2]


def test_consume_exception_drains_in_order():
    consumed = []

    def consume(out, b):
        if b == 2:
            raise ValueError("bad batch 2")
        consumed.append(b)

    with pytest.raises(ValueError, match="bad batch 2"):
        pipelined_map(range(6), lambda b: b, consume, depth=2)
    assert consumed == [0, 1]


def test_negative_depth_rejected():
    with pytest.raises(ValueError):
        pipelined_map([], lambda b: b, lambda o, b: None, depth=-1)


def test_empty_iterable():
    assert pipelined_map([], lambda b: b, lambda o, b: None, depth=4) == 0
