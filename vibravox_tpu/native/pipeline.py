"""ctypes bindings for the native host data-pipeline kernels.

Wraps ``audio_pipeline.cpp`` (single-copy batch collate, polyphase host
resampler).  Every entry point has a pure-python/numpy twin used as both the
fallback when the toolchain is unavailable and the parity oracle in
``tests/test_native_pipeline.py``.  ``VIBRAVOX_NATIVE_PIPELINE=0`` disables
the native path globally.
"""

from __future__ import annotations

import ctypes
import math
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

__all__ = [
    "native_available",
    "collate_pair",
    "resample_poly",
    "host_resample",
]

_lib = None
_load_failed = False


def _load():
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if os.environ.get("VIBRAVOX_NATIVE_PIPELINE", "1") == "0":
        _load_failed = True
        return None
    try:
        from vibravox_tpu.native.build import build

        lib = ctypes.CDLL(str(build()))
        c_float_pp = ctypes.POINTER(ctypes.POINTER(ctypes.c_float))
        lib.vx_collate_pair.restype = None
        lib.vx_collate_pair.argtypes = [
            c_float_pp, c_float_pp,
            np.ctypeslib.ndpointer(np.int64), np.ctypeslib.ndpointer(np.int64),
            np.ctypeslib.ndpointer(np.float32), ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
        ]
        lib.vx_resample_poly.restype = None
        lib.vx_resample_poly.argtypes = [
            np.ctypeslib.ndpointer(np.float32), ctypes.c_int64,
            np.ctypeslib.ndpointer(np.float32), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64,
            np.ctypeslib.ndpointer(np.float32), ctypes.c_int64, ctypes.c_int,
        ]
        _lib = lib
    except Exception:
        _load_failed = True
    return _lib


def native_available() -> bool:
    return _load() is not None


_N_THREADS = int(os.environ.get("VIBRAVOX_NATIVE_THREADS", "8"))


def _as_ptr_array(arrays: Sequence[np.ndarray]):
    ptr_t = ctypes.POINTER(ctypes.c_float)
    ptrs = (ptr_t * len(arrays))()
    for i, a in enumerate(arrays):
        ptrs[i] = a.ctypes.data_as(ptr_t)
    return ptrs


def collate_pair(
    bodies: Sequence[np.ndarray],
    airs: Optional[Sequence[np.ndarray]],
    offsets: Sequence[int],
    target: int,
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Batch-assemble fixed-length rows: crop from ``offsets[i]`` when the
    utterance is longer than ``target``, symmetric zero-pad when shorter.
    Each input is written exactly once into the output buffer.  Returns
    ``(body (B, target) f32, air or None)``.  Requires ``native_available()``.
    """
    lib = _load()
    assert lib is not None, "native pipeline unavailable"
    bodies = [np.ascontiguousarray(b, np.float32) for b in bodies]
    lengths = np.asarray([b.shape[-1] for b in bodies], np.int64)
    offs = np.asarray(offsets, np.int64)
    batch = len(bodies)
    out_body = np.empty((batch, target), np.float32)
    if airs is not None:
        airs = [np.ascontiguousarray(a, np.float32) for a in airs]
        assert all(a.shape[-1] == l for a, l in zip(airs, lengths))
        out_air = np.empty((batch, target), np.float32)
        air_ptrs = _as_ptr_array(airs)
        out_air_ptr = out_air.ctypes.data_as(ctypes.c_void_p)
    else:
        out_air = None
        air_ptrs = None
        out_air_ptr = None
    lib.vx_collate_pair(
        _as_ptr_array(bodies), air_ptrs, lengths, offs,
        out_body, out_air_ptr, batch, target, _N_THREADS,
    )
    return out_body, out_air


def _kernel_bank(orig_freq: int, new_freq: int, window: str) -> Tuple[np.ndarray, int, int, int]:
    """(kernels (phases, width_total) f32, left_pad, orig_g, new_g) — the
    device path's bank (ops/resample.py::_design_kernel) transposed for
    row-major phase access."""
    from vibravox_tpu.ops.resample import (
        _KAISER_BETA,
        _LOWPASS_FILTER_WIDTH,
        _ROLLOFF,
        _design_kernel,
    )

    gcd = math.gcd(int(orig_freq), int(new_freq))
    orig_g, new_g = int(orig_freq) // gcd, int(new_freq) // gcd
    wio, width = _design_kernel(
        orig_g, new_g, _LOWPASS_FILTER_WIDTH, _ROLLOFF, _KAISER_BETA, window
    )
    kernels = np.ascontiguousarray(wio[:, 0, :].T)  # (phases, width_total)
    return kernels, width, orig_g, new_g


def resample_poly(
    x: np.ndarray, orig_freq: int, new_freq: int, window: str = "kaiser"
) -> np.ndarray:
    """Host-side polyphase resample of a 1-D waveform (native kernel).

    Same design and arithmetic as the device resampler
    (``ops/resample.py``); requires ``native_available()``.
    """
    lib = _load()
    assert lib is not None, "native pipeline unavailable"
    x = np.ascontiguousarray(x, np.float32).reshape(-1)
    kernels, width, orig_g, new_g = _kernel_bank(orig_freq, new_freq, window)
    if orig_g == new_g:
        return x
    out_len = int(math.ceil(new_g * len(x) / orig_g))
    out = np.empty((out_len,), np.float32)
    lib.vx_resample_poly(
        x, len(x), kernels, kernels.shape[0], kernels.shape[1],
        orig_g, width, out, out_len, _N_THREADS,
    )
    return out


def _resample_poly_numpy(
    x: np.ndarray, orig_freq: int, new_freq: int, window: str = "kaiser"
) -> np.ndarray:
    """Vectorized numpy twin of ``resample_poly`` (fallback + test oracle)."""
    x = np.ascontiguousarray(x, np.float32).reshape(-1)
    kernels, width, orig_g, new_g = _kernel_bank(orig_freq, new_freq, window)
    if orig_g == new_g:
        return x
    out_len = int(math.ceil(new_g * len(x) / orig_g))
    n_wins = -(-out_len // new_g)
    width_total = kernels.shape[1]
    pad_right = max(0, (n_wins - 1) * orig_g - width + width_total - len(x))
    padded = np.pad(x.astype(np.float64), (width, pad_right))
    starts = np.arange(n_wins) * orig_g
    windows = padded[starts[:, None] + np.arange(width_total)[None, :]]
    y = windows @ kernels.astype(np.float64).T  # (n_wins, phases)
    return y.reshape(-1)[:out_len].astype(np.float32)


def host_resample(
    x: np.ndarray, orig_freq: int, new_freq: int, window: str = "kaiser"
) -> np.ndarray:
    """Host resample with automatic native/numpy selection."""
    if native_available():
        return resample_poly(x, orig_freq, new_freq, window)
    return _resample_poly_numpy(x, orig_freq, new_freq, window)
