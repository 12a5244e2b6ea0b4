"""Batched low-latency serving for enhancement models (EBEN).

The reference stops at batch scripts (``scripts/eben_enhanced_vibravox.py``);
production deployment needs a server-shaped surface: static-shape jitted
execution, length bucketing to bound recompiles, micro-batching to feed the
MXU, and latency accounting.  This module provides it TPU-natively:

* **Length buckets.**  Every request is zero-padded up to the smallest
  configured bucket (multiples of the model's ``multiple``), so the jitted
  enhance function compiles once per (bucket, batch) shape instead of once
  per utterance length.
* **Micro-batching.**  A background worker drains the request queue, groups
  same-bucket requests up to ``max_batch`` and dispatches one jitted call
  for the group; requests wait at most ``max_delay_ms`` for co-riders.
* **Static batch shapes.**  Partial groups are padded with zero rows to the
  fixed ``max_batch`` — one compiled program per bucket, amortised forever.

Synchronous use (``server.enhance(audio)``) and future-based use
(``server.submit(audio)``) share the same path.  Latency percentiles and
throughput are tracked in ``server.stats()``.
"""

from __future__ import annotations

import dataclasses
import queue
import threading
import time
from concurrent.futures import Future
from typing import Any, Optional, Sequence

import numpy as np

__all__ = ["EnhanceServer"]


@dataclasses.dataclass
class _Request:
    future: Future
    audio: np.ndarray
    bucket: int
    t_submit: float


class EnhanceServer:
    """Micro-batching server around a jitted ``(params, (B,T,1)) -> (B,T,1)``
    enhancement model (EBEN generator by default)."""

    def __init__(
        self,
        model: Any,
        params: Any,
        sample_rate: int = 16_000,
        max_batch: int = 8,
        max_delay_ms: float = 5.0,
        bucket_seconds: Sequence[float] = (1.0, 2.0, 4.0, 8.0),
        compute_dtype: Optional[str] = None,
    ):
        import jax
        import jax.numpy as jnp

        self.model = model
        self.params = params
        self.sample_rate = sample_rate
        self.max_batch = int(max_batch)
        self.max_delay_s = float(max_delay_ms) / 1e3
        self.compute_dtype = compute_dtype
        self.buckets = sorted(
            model.valid_length(int(s * sample_rate)) for s in bucket_seconds
        )

        def _enhance(p, x):
            if compute_dtype is not None:
                x = x.astype(jnp.dtype(compute_dtype))
            enhanced, _ = model.apply(p, x)
            return enhanced.astype(jnp.float32)

        self._enhance = jax.jit(_enhance)
        self._jnp = jnp

        self._queue: "queue.Queue[Optional[_Request]]" = queue.Queue()
        self._latencies_ms: list = []
        self._audio_seconds = 0.0
        self._served = 0
        self._lock = threading.Lock()
        self._closed = False
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # ------------------------------------------------------------------ #

    def _bucket_for(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        raise ValueError(
            f"request of {n} samples exceeds the largest bucket "
            f"({self.buckets[-1]}); configure a larger bucket_seconds"
        )

    def warmup(self) -> None:
        """Compile every (bucket, max_batch) program up front (serving must
        not pay a first-request compile)."""
        import jax

        for b in self.buckets:
            x = self._jnp.zeros((self.max_batch, b, 1), self._jnp.float32)
            jax.block_until_ready(self._enhance(self.params, x))

    def submit(self, audio: np.ndarray) -> Future:
        """Enqueue a 1-D waveform; resolves to the enhanced waveform of the
        same length."""
        if self._closed:
            raise RuntimeError("server is closed")
        audio = np.asarray(audio, np.float32).reshape(-1)
        fut: Future = Future()
        self._queue.put(_Request(fut, audio, self._bucket_for(len(audio)), time.perf_counter()))
        return fut

    def enhance(self, audio: np.ndarray) -> np.ndarray:
        return self.submit(audio).result()

    def stats(self) -> dict:
        with self._lock:
            lat = np.asarray(self._latencies_ms) if self._latencies_ms else np.zeros(1)
            return {
                "served": self._served,
                "latency_p50_ms": float(np.percentile(lat, 50)),
                "latency_p95_ms": float(np.percentile(lat, 95)),
                "audio_seconds": self._audio_seconds,
            }

    def close(self) -> None:
        if not self._closed:
            self._closed = True
            self._queue.put(None)
            self._worker.join(timeout=30)

    # ------------------------------------------------------------------ #

    def _run(self) -> None:
        while True:
            req = self._queue.get()
            if req is None:
                return
            group = [req]
            deadline = time.perf_counter() + self.max_delay_s
            # collect co-riders for the same bucket until full or deadline
            while len(group) < self.max_batch:
                timeout = deadline - time.perf_counter()
                if timeout <= 0:
                    break
                try:
                    nxt = self._queue.get(timeout=timeout)
                except queue.Empty:
                    break
                if nxt is None:
                    self._dispatch(group)
                    return
                if nxt.bucket == group[0].bucket:
                    group.append(nxt)
                else:
                    self._dispatch(group)
                    group = [nxt]
                    deadline = time.perf_counter() + self.max_delay_s
            self._dispatch(group)

    def _dispatch(self, group) -> None:
        import jax

        bucket = group[0].bucket
        batch = np.zeros((self.max_batch, bucket, 1), np.float32)
        for row, req in enumerate(group):
            batch[row, : len(req.audio), 0] = req.audio
        try:
            out = self._enhance(self.params, self._jnp.asarray(batch))
            out = np.asarray(jax.device_get(out))
        except Exception as exc:  # surface execution errors to every waiter
            for req in group:
                req.future.set_exception(exc)
            return
        now = time.perf_counter()
        with self._lock:
            for row, req in enumerate(group):
                self._latencies_ms.append((now - req.t_submit) * 1e3)
                self._audio_seconds += len(req.audio) / self.sample_rate
                self._served += 1
        for row, req in enumerate(group):
            req.future.set_result(out[row, : len(req.audio), 0].copy())
