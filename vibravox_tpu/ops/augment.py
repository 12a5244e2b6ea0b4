"""Waveform-domain data augmentation (speed / pitch / time-mask).

Replaces ``vibravox/torch_modules/dsp/data_augmentation.py`` and
``time_masking_waveform.py``.  The reference instantiates torchaudio
``SpeedPerturbation`` / ``PitchShift`` per call inside the CPU collate; here
each transform is a jit-compiled JAX function with kernels cached per factor
(the factor sets are small and fixed, so the number of compiled variants is
bounded — the XLA equivalent of the reference's per-call instantiation).

Pipeline-ordering note: the reference crops to a fixed duration and *then*
augments, letting speed perturbation change the batch length downstream
(``bwe.py:271-288``).  A TPU input pipeline needs constant shapes into the
jitted train step, so this framework augments first and crops/pads to the
target duration afterwards — same augmentation distribution, constant-shape
batches (see ``data/collate.py``).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vibravox_tpu.ops.resample import KaiserResampler, resample
from vibravox_tpu.ops.stft import hann_window

__all__ = [
    "speed_perturbation",
    "pitch_shift",
    "time_masking_block",
    "WaveformDataAugmentation",
]


def speed_perturbation(x: jnp.ndarray, sample_rate: int, factor: float) -> jnp.ndarray:
    """Change playback speed by ``factor`` (output length ≈ T / factor).

    Equivalent to resampling from ``factor * sample_rate`` to ``sample_rate``
    (torchaudio ``SpeedPerturbation`` semantics).  Factors are snapped to
    rationals over 100 like torchaudio does.
    """
    orig = int(round(sample_rate * factor))
    return resample(x, orig, sample_rate)


# --------------------------------------------------------------------------- #
# Phase-vocoder pitch shift
# --------------------------------------------------------------------------- #


def _stft_complex(x: jnp.ndarray, n_fft: int, hop: int, window: jnp.ndarray) -> jnp.ndarray:
    """(B, T) -> (B, n_frames, n_fft//2+1) complex, center/reflect padded."""
    pad = [(0, 0)] * (x.ndim - 1) + [(n_fft // 2, n_fft // 2)]
    x = jnp.pad(x, pad, mode="reflect")
    n_frames = 1 + (x.shape[-1] - n_fft) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = x[..., idx] * window
    return jnp.fft.rfft(frames, axis=-1)


def _istft(spec: jnp.ndarray, n_fft: int, hop: int, window: jnp.ndarray, length: int) -> jnp.ndarray:
    """Inverse STFT by windowed overlap-add with COLA normalisation."""
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1) * window
    n_frames = frames.shape[-2]
    total = n_fft + hop * (n_frames - 1)
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    flat_idx = idx.reshape(-1)
    lead = frames.shape[:-2]
    out = jnp.zeros(lead + (total,), dtype=frames.dtype)
    out = out.at[..., flat_idx].add(frames.reshape(lead + (-1,)))
    norm = jnp.zeros((total,), dtype=frames.dtype)
    norm = norm.at[flat_idx].add(jnp.broadcast_to(window**2, idx.shape).reshape(-1))
    out = out / jnp.clip(norm, min=1e-8)
    start = n_fft // 2
    return out[..., start : start + length]


def _phase_vocoder(spec: jnp.ndarray, rate: float, hop: int, n_fft: int) -> jnp.ndarray:
    """Time-stretch a complex STFT by ``rate`` along the frame axis."""
    n_freq = spec.shape[-1]
    phi_advance = jnp.linspace(0, jnp.pi * hop, n_freq)[None, :]
    n_frames = spec.shape[-2]
    steps = jnp.arange(0, n_frames, rate)
    idx_low = jnp.floor(steps).astype(jnp.int32)
    idx_high = jnp.clip(idx_low + 1, max=n_frames - 1)
    frac = (steps - idx_low)[:, None]

    spec_pad = spec
    s0 = spec_pad[..., idx_low, :]
    s1 = spec_pad[..., idx_high, :]
    mag = (1 - frac) * jnp.abs(s0) + frac * jnp.abs(s1)

    phase0 = jnp.angle(s0)
    phase1 = jnp.angle(s1)
    dphase = phase1 - phase0 - phi_advance
    dphase = dphase - 2 * jnp.pi * jnp.round(dphase / (2 * jnp.pi))
    inst_phase_inc = phi_advance + dphase  # per-step phase increment

    first_phase = phase0[..., :1, :]
    acc = jnp.cumsum(inst_phase_inc, axis=-2)
    phase = jnp.concatenate([first_phase, first_phase + acc[..., :-1, :]], axis=-2)
    # build the complex result from real/imag parts (complex exp is not
    # available on all TPU backends, and cos/sin fuse better anyway)
    return jax.lax.complex(mag * jnp.cos(phase), mag * jnp.sin(phase))


def pitch_shift(
    x: jnp.ndarray,
    sample_rate: int,
    n_steps: float,
    bins_per_octave: int = 12,
    n_fft: int = 512,
    hop: Optional[int] = None,
) -> jnp.ndarray:
    """Pitch-shift by ``n_steps`` semitones, preserving length.

    Phase-vocoder time stretch by ``2**(n_steps/bins_per_octave)`` followed by
    polyphase resampling back to the original length (torchaudio
    ``PitchShift`` algorithm).
    """
    hop = hop or n_fft // 4
    # stretch rate < 1 slows the signal down; resampling back to the original
    # length then raises the pitch by 2**(n_steps/bins_per_octave)
    rate = 2.0 ** (-n_steps / bins_per_octave)
    lead = x.shape[:-1]
    length = x.shape[-1]
    flat = x.reshape((-1, length))
    window = hann_window(n_fft, flat.dtype)
    spec = _stft_complex(flat, n_fft, hop, window)
    stretched = _phase_vocoder(spec, rate, hop, n_fft)
    stretch_len = int(length / rate)
    y = _istft(stretched, n_fft, hop, window, stretch_len)
    y = resample(y, int(sample_rate / rate), sample_rate)
    # fix output length to input length (torchaudio semantics)
    if y.shape[-1] >= length:
        y = y[..., :length]
    else:
        y = jnp.pad(y, [(0, 0), (0, length - y.shape[-1])])
    return y.reshape(lead + (length,))


def time_masking_block(x: jnp.ndarray, masking_percentage: float, rng: jax.Array) -> jnp.ndarray:
    """Zero a random contiguous block of ``masking_percentage``% samples.

    Reference: ``time_masking_waveform.py:17-35`` (functional, out-of-place).
    """
    time_samples = x.shape[-1]
    masked = int(time_samples * masking_percentage / 100)
    start = jax.random.randint(rng, (), 0, time_samples - masked)
    pos = jnp.arange(time_samples)
    mask = (pos >= start) & (pos < start + masked)
    return jnp.where(mask, 0.0, x)


class WaveformDataAugmentation:
    """Waveform augmentation on one or two coupled waveforms.

    Mirrors ``WaveformDataAugmentation`` (``data_augmentation.py:8-69``):
    gated by ``p_data_augmentation``, then each transform fires independently
    with its own probability and a uniformly drawn factor/step/percentage.
    Gating decisions run on the host (numpy RNG), matching the reference's
    CPU-collate placement; the transforms themselves are jitted JAX.
    """

    def __init__(
        self,
        sample_rate: int,
        p_data_augmentation: float = 0.0,
        p_speed_perturbation: float = 0.3,
        p_pitch_shift: float = 0.3,
        p_time_masking: float = 0.3,
        speed_perturbation_factors: Sequence[float] = (
            0.7, 0.8, 0.85, 0.9, 0.95, 1.05, 1.1, 1.15, 1.2, 1.3,
        ),
        pitch_shift_steps: Sequence[int] = (-4, -3, -2, -1, 1, 2, 3, 4, 5, 6),
        time_masking_percentage: Sequence[int] = (1, 2, 3, 4, 5, 6, 7, 8),
    ):
        for name, p in [
            ("p_data_augmentation", p_data_augmentation),
            ("p_speed_perturbation", p_speed_perturbation),
            ("p_pitch_shift", p_pitch_shift),
            ("p_time_masking", p_time_masking),
        ]:
            assert 0 <= p <= 1, f"{name} must be in [0, 1]"
        self.sample_rate = sample_rate
        self.p_data_augmentation = p_data_augmentation
        self.p_speed_perturbation = p_speed_perturbation
        self.p_pitch_shift = p_pitch_shift
        self.p_time_masking = p_time_masking
        self.speed_perturbation_factors = tuple(speed_perturbation_factors)
        self.pitch_shift_steps = tuple(pitch_shift_steps)
        self.time_masking_percentage = tuple(time_masking_percentage)

    def __call__(
        self,
        waveform_1: jnp.ndarray,
        waveform_2: Optional[jnp.ndarray] = None,
        *,
        rng: np.random.Generator,
        jax_rng: jax.Array,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        if rng.random() < self.p_data_augmentation:
            if rng.random() < self.p_speed_perturbation:
                factor = self.speed_perturbation_factors[
                    rng.integers(len(self.speed_perturbation_factors))
                ]
                waveform_1 = speed_perturbation(waveform_1, self.sample_rate, factor)
                if waveform_2 is not None:
                    waveform_2 = speed_perturbation(waveform_2, self.sample_rate, factor)
            if rng.random() < self.p_pitch_shift:
                step = self.pitch_shift_steps[rng.integers(len(self.pitch_shift_steps))]
                waveform_1 = pitch_shift(waveform_1, self.sample_rate, step)
                if waveform_2 is not None:
                    waveform_2 = pitch_shift(waveform_2, self.sample_rate, step)
            if rng.random() < self.p_time_masking:
                pct = self.time_masking_percentage[
                    rng.integers(len(self.time_masking_percentage))
                ]
                jax_rng, k = jax.random.split(jax_rng)
                waveform_1 = time_masking_block(waveform_1, pct, k)
                if waveform_2 is not None:
                    waveform_2 = time_masking_block(waveform_2, pct, k)
        return waveform_1, waveform_2
