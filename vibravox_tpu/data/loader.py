"""Host-side data loader: batching, shuffling, background prefetch.

Replaces torch ``DataLoader`` workers (``bwe.py:149-181``) with a simple
threaded prefetcher: collate on a worker thread while the device computes
the previous step, hiding the host time behind TPU time.  Per-host sharding
(`process_index`) slices the index space so multi-host data parallel reads
disjoint data — the reference reloads the full dataset on every rank.
"""

from __future__ import annotations

import itertools
import queue
import threading
from typing import Callable, Dict, Iterator, Optional, Sequence

import jax
import numpy as np

__all__ = ["DataLoader"]


def _has_len(source) -> bool:
    try:
        len(source)
        return True
    except TypeError:
        return False


class DataLoader:
    def __init__(
        self,
        source,
        collate_fn: Callable,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = False,
        seed: int = 0,
        prefetch: int = 2,
        shard_by_process: bool = True,
    ):
        self.source = source
        self.collate_fn = collate_fn
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.seed = seed
        self.epoch = 0
        self._epoch_pinned = False
        # iterable (streaming) sources have no len/__getitem__: batches are
        # drawn from the stream through a shuffle buffer instead of an index
        # permutation (the reference's streaming=True HF path — bwe.py:108)
        self.iterable = not _has_len(source)
        self.shuffle_buffer = 256
        if shard_by_process and jax.process_count() > 1:
            self.process_slice = (jax.process_index(), jax.process_count())
        else:
            self.process_slice = (0, 1)

    def set_epoch(self, epoch: int) -> None:
        """Key the NEXT pass's shuffle to the trainer epoch (torch
        ``DistributedSampler.set_epoch`` pattern).  Without it the shuffle is
        keyed to the per-process ``__iter__`` count, so a preemption-resumed
        run replays the permutation sequence from pass 1 — resumed epoch N
        would see the same data order as the original run's epoch 0.  The
        Trainer calls this with ``current_epoch`` at each epoch start."""
        self.epoch = int(epoch)
        self._epoch_pinned = True

    def _epoch_rng(self) -> np.random.Generator:
        """Per-epoch rng as a PURE function of (seed, epoch): no hidden
        generator state, so ``len(loader)`` is side-effect-free and every
        host of a multi-process run derives the identical permutation
        regardless of how many times each one inspected the loader (the
        per-host shards ``idx[rank::world]`` stay disjoint)."""
        return np.random.default_rng((self.seed, self.epoch))

    def _indices(self) -> np.ndarray:
        n = len(self.source)
        idx = np.arange(n)
        if self.shuffle:
            self._epoch_rng().shuffle(idx)
        rank, world = self.process_slice
        return idx[rank::world]

    def __len__(self) -> int:
        if self.iterable:
            raise TypeError("streaming DataLoader has no length")
        n = len(self._indices())
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _batches(self) -> Iterator[Dict[str, np.ndarray]]:
        if self.iterable:
            yield from self._batches_streaming()
            return
        idx = self._indices()
        for start in range(0, len(idx), self.batch_size):
            chunk = idx[start : start + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                return
            yield self.collate_fn([self.source[int(i)] for i in chunk])

    def _batches_streaming(self) -> Iterator[Dict[str, np.ndarray]]:
        rank, world = self.process_slice
        it: Iterator = iter(self.source)
        if world > 1:
            # strided per-host sharding of the stream (disjoint examples)
            it = itertools.islice(it, rank, None, world)
        rng = self._epoch_rng()
        buffer: list = []
        pending: list = []

        def drain_one():
            i = rng.integers(len(buffer)) if self.shuffle else 0
            pending.append(buffer.pop(int(i)))

        for item in it:
            buffer.append(item)
            if len(buffer) >= (self.shuffle_buffer if self.shuffle else self.batch_size):
                drain_one()
            if len(pending) == self.batch_size:
                yield self.collate_fn(pending)
                pending = []
        while buffer:
            drain_one()
            if len(pending) == self.batch_size:
                yield self.collate_fn(pending)
                pending = []
        if pending and not self.drop_last:
            yield self.collate_fn(pending)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        if self._epoch_pinned:
            self._epoch_pinned = False
        else:
            self.epoch += 1
        if self.prefetch <= 0:
            yield from self._batches()
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        error: list = []
        stop = threading.Event()

        def worker():
            try:
                for batch in self._batches():
                    # bounded put so an abandoned consumer (early `break`,
                    # `next(iter(loader))` example draws, limit_*_batches)
                    # can release the worker instead of leaking a thread
                    # blocked on a full queue for the process lifetime
                    while not stop.is_set():
                        try:
                            q.put(batch, timeout=0.1)
                            break
                        except queue.Full:
                            continue
                    if stop.is_set():
                        return
            except Exception as e:  # surface loader errors on the main thread
                error.append(e)
            finally:
                # deliver the sentinel unless the consumer already left
                # (stop set → nobody is reading; drain+join handle cleanup)
                while not stop.is_set():
                    try:
                        q.put(sentinel, timeout=0.1)
                        break
                    except queue.Full:
                        continue

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    break
                yield item
        finally:
            stop.set()
            while True:  # drain so a blocked put can proceed
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
            t.join(timeout=10.0)
        if error:
            raise error[0]
