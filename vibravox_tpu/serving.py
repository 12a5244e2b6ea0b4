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

__all__ = ["EnhanceServer", "StreamingEnhancer"]


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
        not pay a first-request compile), then warm the *worker-thread*
        dispatch path.

        The second step matters on tunnelled backends (axon TPU): the first
        execution dispatched from a non-main thread can stall tens of
        seconds — and indefinitely when the main thread is idle — until the
        main thread keeps the device connection pumping.  Serving dispatches
        exclusively from the worker thread, so warmup drives one dummy
        request through it while pumping from the caller, and resets the
        latency stats afterwards so the dummy's warmup latency never
        pollutes p50/p95.
        """
        import jax

        for b in self.buckets:
            x = self._jnp.zeros((self.max_batch, b, 1), self._jnp.float32)
            jax.block_until_ready(self._enhance(self.params, x))
        fut = self.submit(np.zeros(self.buckets[0], np.float32))
        pump = self._jnp.zeros((self.max_batch, self.buckets[0], 1), self._jnp.float32)
        deadline = time.perf_counter() + 300.0
        while not fut.done() and time.perf_counter() < deadline:
            jax.block_until_ready(self._enhance(self.params, pump))
        fut.result(timeout=60.0)
        with self._lock:
            self._latencies_ms = []
            self._audio_seconds = 0.0
            self._served = 0

    def submit(self, audio: np.ndarray, input_sample_rate: Optional[int] = None) -> Future:
        """Enqueue a 1-D waveform; resolves to the enhanced waveform of the
        same length.

        ``input_sample_rate`` accepts requests at arbitrary rates: the audio
        is polyphase-resampled to the model rate on the host (native C++
        kernel — ``vibravox_tpu/native/pipeline.py``; the device path must
        not pay an eager per-request dispatch) and the result is resampled
        back, so callers always get their own rate and length back.
        """
        if self._closed:
            raise RuntimeError("server is closed")
        audio = np.asarray(audio, np.float32).reshape(-1)
        in_rate = int(input_sample_rate or self.sample_rate)
        in_len = len(audio)
        if in_rate != self.sample_rate:
            from vibravox_tpu.native.pipeline import host_resample

            audio = host_resample(audio, in_rate, self.sample_rate)
        fut: Future = Future()
        if in_rate != self.sample_rate:
            inner: Future = Future()

            def _back(f: Future):
                if f.exception() is not None:
                    fut.set_exception(f.exception())
                    return
                from vibravox_tpu.native.pipeline import host_resample

                out = host_resample(f.result(), self.sample_rate, in_rate)
                if len(out) < in_len:  # ceil-length mismatch at the edge
                    out = np.pad(out, (0, in_len - len(out)))
                fut.set_result(out[:in_len])

            inner.add_done_callback(_back)
            target = inner
        else:
            target = fut
        # the closed-check + enqueue must be atomic with close()'s
        # closed-transition: otherwise a request enqueued between close()'s
        # sentinel and its drain would hang its caller on .result() forever
        with self._lock:
            if self._closed:
                raise RuntimeError("server is closed")
            self._queue.put(
                _Request(target, audio, self._bucket_for(len(audio)), time.perf_counter())
            )
        return fut

    def enhance(self, audio: np.ndarray, input_sample_rate: Optional[int] = None) -> np.ndarray:
        return self.submit(audio, input_sample_rate=input_sample_rate).result()

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
        # the closed-transition + sentinel happen under the same lock as
        # submit's closed-check + enqueue, so no request can land behind the
        # sentinel; the join and drain run outside the lock (the join can
        # take seconds — submit must fail fast, not block on it)
        with self._lock:
            if self._closed:
                return
            self._closed = True
            self._queue.put(None)
        self._worker.join(timeout=30)
        # belt-and-braces: fail anything still queued (cannot happen via
        # submit any more, but keeps the invariant under future edits)
        while True:
            try:
                req = self._queue.get_nowait()
            except queue.Empty:
                break
            if req is not None:
                req.future.set_exception(RuntimeError("server is closed"))

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


class StreamingEnhancer:
    """Bounded-latency streaming enhancement over an unbounded audio stream.

    The reference's EBEN is offline-only (whole utterances —
    ``scripts/eben_enhanced_vibravox.py``); live capture needs chunked
    processing.  The generator is a finite-receptive-field FIR stack (PQMF
    analysis, strided conv U-Net, PQMF synthesis), so overlap windowing is
    *exact*: each window covers ``context`` samples either side of the
    ``chunk`` it emits, and windows start on the model's stride grid
    (multiples of ``model.multiple``, 256 for m=4) so every downsampling
    phase matches offline processing.  The FIRST window consumes the signal
    head directly (no zero pre-pad — conv biases make a zero left context
    differ from the model's own edge transient) and emits its leading
    ``context + chunk`` samples, so as long as ``context`` covers the
    receptive-field radius the streamed output equals the offline forward
    to float tolerance everywhere EXCEPT the flushed tail, where zeros
    stand in for future samples the stream never saw (pinned by
    ``tests/test_serving.py``).

    One window shape → one compiled program.  The first output (of
    ``context + chunk`` samples) arrives after ``latency_samples =
    window`` inputs (defaults ≈ 20k samples ≈ 1.28 s @ 16 kHz); the
    steady-state input→output lag is ``chunk + right_context`` — the m=4
    generator's receptive field spans several thousand samples through the
    dilated stacks and latent convs, so a generous default context keeps
    streaming *exact*; lower ``context`` for lower latency at the cost of
    window-edge error.

    Usage::

        stream = StreamingEnhancer(model, params)
        for block in microphone:         # arbitrary block sizes
            out = stream.push(block)     # enhanced samples as they're ready
        tail = stream.flush()            # drain with zero right-padding
    """

    def __init__(
        self,
        model: Any,
        params: Any,
        chunk: int = 4096,
        context: int = 8192,
        compute_dtype: Optional[str] = None,
    ):
        import jax
        import jax.numpy as jnp

        multiple = int(model.multiple)
        if chunk % multiple or context % multiple:
            raise ValueError(
                f"chunk and context must be multiples of the model stride grid "
                f"({multiple}); got chunk={chunk}, context={context}"
            )
        self.model = model
        self.params = params
        self.chunk = int(chunk)
        self.context = int(context)
        # left context and chunk stay on the stride grid (every window start
        # is ≡ 0 mod `multiple` in stream coordinates, matching offline
        # phase); the RIGHT context absorbs the model's valid-length
        # adjustment (valid lengths are ≡ -n mod multiple), shrinking by
        # n ≤ right_context < context
        self._window = int(model.valid_length(2 * self.context + self.chunk))
        self._right_context = self._window - self.context - self.chunk
        if self._right_context <= 0:
            raise ValueError("context too small for the model's valid-length grid")

        def _enhance(p, x):
            if compute_dtype is not None:
                x = x.astype(jnp.dtype(compute_dtype))
            enhanced, _ = model.apply(p, x)
            return enhanced.astype(jnp.float32)

        self._enhance = jax.jit(_enhance)
        self._jnp = jnp
        # buffered input not yet consumed; the first window reads the raw
        # signal head (exact edge semantics), later windows carry `context`
        # already-emitted samples on their left
        self._buf = np.zeros(0, np.float32)
        self._first = True
        self._pushed = 0
        self._emitted = 0
        self._flushed = False

    @property
    def latency_samples(self) -> int:
        """Samples buffered before the first output (one full window; the
        steady-state lag thereafter is ``chunk + right_context``)."""
        return self._window

    def _emit_ready(self) -> np.ndarray:
        outs = []
        while len(self._buf) >= self._window:
            x = self._jnp.asarray(self._buf[: self._window][None, :, None])
            y = np.asarray(self._enhance(self.params, x))[0, :, 0]
            if self._first:
                outs.append(y[: self.context + self.chunk].copy())
                self._first = False
            else:
                outs.append(y[self.context : self.context + self.chunk].copy())
            self._buf = self._buf[self.chunk :]
        out = np.concatenate(outs) if outs else np.zeros(0, np.float32)
        self._emitted += out.size
        return out

    def push(self, samples: np.ndarray) -> np.ndarray:
        """Feed captured samples; returns enhanced samples as they complete
        (possibly empty — output arrives ``latency_samples`` behind input)."""
        if self._flushed:
            raise RuntimeError("stream already flushed")
        samples = np.asarray(samples, np.float32).reshape(-1)
        self._pushed += samples.size
        self._buf = np.concatenate([self._buf, samples])
        return self._emit_ready()

    def flush(self) -> np.ndarray:
        """End of stream: zero-pad the right context and emit the remainder."""
        if self._flushed:
            return np.zeros(0, np.float32)
        self._flushed = True
        owed = self._pushed - self._emitted
        if owed <= 0:
            return np.zeros(0, np.float32)
        pad = self._window + self.chunk  # covers any final partial window
        self._buf = np.concatenate([self._buf, np.zeros(pad, np.float32)])
        out = self._emit_ready()
        return out[:owed]
