"""Biquad IIR filtering as a JAX scan + zero-phase low-pass (filt-filt).

Replaces ``torchaudio.functional.lowpass_biquad`` and the reference's
``remove_hf`` filt-filt helper (``vibravox/utils.py:84-116``).

The recurrence is sequential by nature; it is expressed as a
``jax.lax.scan`` over time with a 2-state direct-form-II-transposed update,
which XLA compiles to a tight on-device loop.  This path is used by data
preparation / analysis utilities, not the training hot loop.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["biquad_coeffs_lowpass", "biquad_apply", "lowpass_biquad", "remove_hf"]


def biquad_coeffs_lowpass(sample_rate: int, cutoff_freq: float, Q: float = 0.707) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """RBJ audio-EQ-cookbook low-pass biquad coefficients (torchaudio-compatible)."""
    w0 = 2.0 * math.pi * cutoff_freq / sample_rate
    alpha = math.sin(w0) / (2.0 * Q)
    cos_w0 = math.cos(w0)
    b0 = (1.0 - cos_w0) / 2.0
    b1 = 1.0 - cos_w0
    b2 = (1.0 - cos_w0) / 2.0
    a0 = 1.0 + alpha
    a1 = -2.0 * cos_w0
    a2 = 1.0 - alpha
    b = jnp.array([b0, b1, b2]) / a0
    a = jnp.array([1.0, a1 / a0, a2 / a0])
    return b, a


def biquad_apply(x: jnp.ndarray, b: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    """Apply one biquad along the trailing time axis (direct form II transposed)."""

    def step(state, xt):
        z1, z2 = state
        yt = b[0] * xt + z1
        z1_new = b[1] * xt - a[1] * yt + z2
        z2_new = b[2] * xt - a[2] * yt
        return (z1_new, z2_new), yt

    lead_shape = x.shape[:-1]
    zeros = jnp.zeros(lead_shape, dtype=x.dtype)
    xt_seq = jnp.moveaxis(x, -1, 0)
    _, y = jax.lax.scan(step, (zeros, zeros), xt_seq)
    return jnp.moveaxis(y, 0, -1)


def lowpass_biquad(x: jnp.ndarray, sample_rate: int, cutoff_freq: float, Q: float = 0.707) -> jnp.ndarray:
    b, a = biquad_coeffs_lowpass(sample_rate, cutoff_freq, Q)
    return biquad_apply(x, b.astype(x.dtype), a.astype(x.dtype))


def remove_hf(
    waveform: jnp.ndarray,
    sample_rate: int,
    cutoff_freq: float,
    padding_length: int = 3000,
) -> jnp.ndarray:
    """4th-order zero-phase low-pass via the filt-filt trick.

    Reflection-pads for IIR settling, filters forward and backward with the
    same biquad, then un-pads.  Reference: ``vibravox/utils.py:84-116``.
    """
    pad_width = [(0, 0)] * (waveform.ndim - 1) + [(padding_length, padding_length)]
    x = jnp.pad(waveform, pad_width, mode="reflect")
    x = lowpass_biquad(x, sample_rate, cutoff_freq)
    x = jnp.flip(x, axis=-1)
    x = lowpass_biquad(x, sample_rate, cutoff_freq)
    x = jnp.flip(x, axis=-1)
    return x[..., padding_length:-padding_length]
