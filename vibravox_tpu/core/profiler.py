"""Profiling subsystem: per-step timing statistics + XLA trace capture.

The reference has no tracing/profiling at all (SURVEY §5); this framework
exposes one as a first-class subsystem: a low-overhead step timer whose
percentiles land in the experiment logs, and an optional
``jax.profiler`` trace window for TensorBoard's trace viewer.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional

import numpy as np

__all__ = ["StepTimer", "trace_window"]


class StepTimer:
    """Records wall time per step; computes summary stats on demand."""

    def __init__(self, warmup_steps: int = 2):
        self.warmup_steps = warmup_steps
        self._times: List[float] = []
        self._t0: Optional[float] = None
        self._count = 0

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> None:
        if self._t0 is None:
            return
        dt = time.perf_counter() - self._t0
        self._t0 = None
        self._count += 1
        if self._count > self.warmup_steps:  # skip compile steps
            self._times.append(dt)

    def summary(self, prefix: str = "profile/") -> Dict[str, float]:
        if not self._times:
            return {}
        arr = np.asarray(self._times)
        return {
            f"{prefix}step_ms_mean": float(arr.mean() * 1e3),
            f"{prefix}step_ms_p50": float(np.percentile(arr, 50) * 1e3),
            f"{prefix}step_ms_p95": float(np.percentile(arr, 95) * 1e3),
            f"{prefix}step_ms_max": float(arr.max() * 1e3),
            f"{prefix}steps_per_sec": float(1.0 / arr.mean()),
        }

    def reset(self) -> None:
        self._times.clear()
        self._count = 0


class trace_window:
    """Context manager capturing an XLA profiler trace to ``trace_dir``."""

    def __init__(self, trace_dir: str):
        self.trace_dir = trace_dir
        self.active = False

    def __enter__(self):
        import jax

        try:
            jax.profiler.start_trace(self.trace_dir)
            self.active = True
        except Exception:  # backend without profiler support
            self.active = False
        return self

    def __exit__(self, *exc):
        if self.active:
            import jax

            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
        return False
