"""Host-side data loading: sharding, shuffling, batching, prefetch.

TPU-native replacement for the reference's DataLoader + DistributedSampler
stack (SURVEY §2.10): per-process sharding keyed on ``jax.process_index()``
replaces DistributedSampler(num_replicas, rank); a thread-pool prefetcher
replaces worker processes (decode is PIL/numpy, which releases the GIL for the
heavy parts). Deterministic epoch reshuffle matches DistributedSampler
semantics (same seed+epoch -> same permutation on every host).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import numpy as np


def collate(samples, micro_batch: bool = False):
    """Stack (x, y, metadata) tuples; metadata values stacked when array-like.

    Mirrors the reference collate (lightning_data.py:30-50): array metadata is
    stacked, scalars become arrays, non-numeric stay lists. ``micro_batch``
    concatenates pre-batched samples instead of stacking (the reference's
    micro-batch collate for datasets exposing ``micro_batch_size``,
    lightning_data.py:11-28).
    """
    if micro_batch:
        xs = np.concatenate([np.asarray(s[0], np.float32) for s in samples])
        ys_raw = [y for s in samples for y in (
            s[1] if isinstance(s[1], (list, np.ndarray)) else [s[1]]
        )]
        metadata = {}
        for k in samples[0][2].keys():
            vals = [s[2][k] for s in samples]
            if isinstance(vals[0], np.ndarray):
                metadata[k] = np.concatenate(vals)
            else:
                metadata[k] = [v for val in vals
                               for v in (val if isinstance(val, list) else [val])]
        if isinstance(ys_raw[0], (int, np.integer)):
            return xs, np.asarray(ys_raw, np.int64), metadata
        return xs, ys_raw, metadata
    xs = np.stack([np.asarray(s[0], np.float32) for s in samples])
    ys_raw = [s[1] for s in samples]
    if isinstance(ys_raw[0], (int, np.integer)):
        ys = np.asarray(ys_raw, np.int64)
    elif isinstance(ys_raw[0], np.ndarray):
        ys = np.stack(ys_raw)
    else:
        ys = ys_raw  # strings (prompts)
    metadata = {}
    keys = samples[0][2].keys()
    for k in keys:
        vals = [s[2][k] for s in samples]
        if isinstance(vals[0], np.ndarray):
            metadata[k] = np.stack(vals)
        elif isinstance(vals[0], (int, float, np.integer, np.floating)):
            metadata[k] = np.asarray(vals)
        else:
            metadata[k] = vals
    return xs, ys, metadata


class ShardedLoader:
    """Map-style dataset -> per-process shard -> shuffled batches with prefetch."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        num_workers: int = 4,
        prefetch: int = 4,
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
        infinite: bool = False,
    ):
        import jax

        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.infinite = infinite
        self.rank = process_index if process_index is not None else jax.process_index()
        self.world = process_count if process_count is not None else jax.process_count()
        self.epoch = 0
        self._start_offset = 0  # first-epoch batch offset (set_position)

    def set_position(self, global_batch: int) -> None:
        """Fast-forward to the ``global_batch``-th batch of the stream.

        Because the per-epoch shuffle is a pure function of (seed, epoch),
        a (epoch, within-epoch offset) pair fully determines the stream;
        skipping costs index arithmetic only — no samples are fetched. A fit
        resumed from a step-S checkpoint calls ``set_position(S)`` so the
        data order continues exactly where the interrupted run stopped
        (one loader batch per train step), instead of re-serving the head
        of the dataset. The reference has no data-order resume at all
        (Lightning restarts the DistributedSampler at epoch granularity).
        """
        if global_batch < 0:
            raise ValueError(f"global_batch must be >= 0, got {global_batch}")
        per_epoch = len(self)
        self.epoch = global_batch // per_epoch
        self._start_offset = global_batch % per_epoch

    def _shard_indices(self, epoch: int) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + epoch)
            idx = rng.permutation(n)
        # pad to a multiple of world (DistributedSampler semantics), and to at
        # least one full batch per shard so tiny datasets still train
        per = max(-(-n // self.world), self.batch_size if self.drop_last else 1)
        target = per * self.world
        while len(idx) < target:
            idx = np.concatenate([idx, idx[: target - len(idx)]])
        return idx[self.rank :: self.world]

    def __len__(self):
        per = len(self._shard_indices(0))
        if self.drop_last:
            return per // self.batch_size
        return -(-per // self.batch_size)

    def _epoch_batches(self, epoch: int, skip: int = 0) -> Iterator:
        from concurrent.futures import ThreadPoolExecutor

        idx = self._shard_indices(epoch)
        nb = len(idx) // self.batch_size if self.drop_last else -(
            -len(idx) // self.batch_size
        )
        batches = [
            idx[i * self.batch_size : (i + 1) * self.batch_size] for i in range(nb)
        ][skip:]
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
            stop = threading.Event()

            micro = getattr(self.dataset, "micro_batch_size", None) is not None

            def fetch(bidx):
                return collate([self.dataset[int(i)] for i in bidx],
                               micro_batch=micro)

            def producer():
                try:
                    futures = [
                        pool.submit(fetch, b) for b in batches[: self.prefetch]
                    ]
                    next_submit = self.prefetch
                    for i in range(len(batches)):
                        if stop.is_set():
                            return
                        q.put(futures[i].result())
                        if stop.is_set():
                            return
                        if next_submit < len(batches):
                            futures.append(
                                pool.submit(fetch, batches[next_submit]))
                            next_submit += 1
                    q.put(None)
                except RuntimeError:
                    # pool shut down mid-submit: the consumer abandoned the
                    # epoch (e.g. fit() hit max_steps on an infinite loader)
                    if not stop.is_set():
                        raise
                except BaseException as e:  # deliver fetch errors in-stream
                    q.put(e)

            t = threading.Thread(target=producer, daemon=True)
            t.start()
            try:
                while True:
                    item = q.get()
                    if item is None:
                        break
                    if isinstance(item, BaseException):
                        raise item
                    yield item
            finally:
                stop.set()
                # unblock a producer stuck in q.put so it can observe stop
                while True:
                    try:
                        q.get_nowait()
                    except queue.Empty:
                        break

    def __iter__(self):
        epoch = self.epoch
        skip, self._start_offset = self._start_offset, 0
        while True:
            yield from self._epoch_batches(epoch, skip=skip)
            skip = 0
            epoch += 1
            if not self.infinite:
                break
        self.epoch = epoch


class IterableLoader:
    """Batching wrapper for iterable (streaming) datasets.

    The reference DataModule skips DistributedSampler for IterableDatasets
    (lightning_data.py, ``use_distributed_sampler: false``) — sharding is the
    dataset's job (e.g. PixWebDataset). This wrapper only collates and
    prefetches on a background thread.
    """

    def __init__(self, dataset, batch_size: int, drop_last: bool = True,
                 prefetch: int = 4, infinite: bool = False, **_ignored):
        self.dataset = dataset
        self.batch_size = batch_size
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.infinite = infinite

    def _batches(self):
        while True:
            buf = []
            for sample in self.dataset:
                buf.append(sample)
                if len(buf) == self.batch_size:
                    yield collate(buf)
                    buf = []
            if buf and not self.drop_last:
                yield collate(buf)
            if not self.infinite:
                return

    def __iter__(self):
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                for b in self._batches():
                    if stop.is_set():
                        return
                    q.put(b)
                    if stop.is_set():
                        return
                q.put(None)
            except BaseException as e:  # deliver stream errors in-stream
                q.put(e)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            # unblock a producer stuck in q.put so it can observe stop
            while True:
                try:
                    q.get_nowait()
                except queue.Empty:
                    break


def make_loader(dataset, batch_size: int, **kwargs):
    """ShardedLoader for map-style datasets, IterableLoader for streams."""
    if hasattr(dataset, "__len__") and hasattr(dataset, "__getitem__"):
        return ShardedLoader(dataset, batch_size, **kwargs)
    for k in ("shuffle", "seed", "num_workers", "process_index",
              "process_count"):
        kwargs.pop(k, None)
    return IterableLoader(dataset, batch_size, **kwargs)
