"""Audio shaping utilities (pad / crop / duration / mixing).

Functional equivalents of the reference helpers (``vibravox/utils.py:7-254``),
reworked for JAX: explicit PRNG keys instead of torch global RNG, and
batched jit-compatible variants of the list-based mixing helpers.

Tensors are channels-last ``(..., time)`` on the trailing *time* axis for the
1-D helpers, matching the reference's convention.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "pad_audio",
    "slice_audio",
    "set_audio_duration",
    "mix_speech_and_noise_with_rescaling",
    "mix_speech_and_noise_without_rescaling",
]


def pad_audio(audio: jnp.ndarray, desired_samples: int) -> jnp.ndarray:
    """Symmetrically zero-pad the trailing axis to ``desired_samples``.

    Reference: ``vibravox/utils.py:7-31``.  (The reference computes the left
    pad as ``desired - initial // 2`` which for short inputs also *truncates*
    the tail; this implementation uses the evidently-intended symmetric split
    ``(desired - initial) // 2`` and never drops samples.)
    """
    initial = audio.shape[-1]
    assert initial <= desired_samples, (
        "The audio signal is longer than the desired duration. Use set_audio_duration instead."
    )
    left = (desired_samples - initial) // 2
    right = desired_samples - initial - left
    pad_width = [(0, 0)] * (audio.ndim - 1) + [(left, right)]
    return jnp.pad(audio, pad_width)


def slice_audio(audio: jnp.ndarray, desired_samples: int, offset_samples) -> jnp.ndarray:
    """Slice ``desired_samples`` from the trailing axis starting at offset.

    Works with traced offsets (uses ``lax.dynamic_slice_in_dim``), so it can
    sit inside a jitted input pipeline.  Reference: ``vibravox/utils.py:33-48``.
    """
    assert audio.shape[-1] >= desired_samples, (
        "The audio signal is shorter than the desired duration. Use pad_audio instead."
    )
    return jax.lax.dynamic_slice_in_dim(audio, offset_samples, desired_samples, axis=-1)


def set_audio_duration(
    audio: jnp.ndarray,
    desired_samples: int,
    audio_bis: Optional[jnp.ndarray] = None,
    deterministic: bool = False,
    rng: Optional[jax.Array] = None,
):
    """Crop (random in train / centered in eval) or pad to a fixed duration.

    The coupled pair (body-conducted + airborne) is cropped with the *same*
    offset, preserving cross-sensor time alignment — the property the
    reference's tests check by cross-correlation (``tests/lightning_datamodules/
    bwe_test.py:47-68``).  Reference: ``vibravox/utils.py:50-81``.
    """
    initial = audio.shape[-1]
    assert audio_bis is None or audio.shape == audio_bis.shape, (
        "The two audio signals must have the same shape."
    )
    if initial >= desired_samples:
        if deterministic:
            offset = (initial - desired_samples) // 2
        else:
            if rng is None:
                raise ValueError("rng key required for non-deterministic crop")
            offset = jax.random.randint(rng, (), 0, initial - desired_samples + 1)
        audio = slice_audio(audio, desired_samples, offset)
        if audio_bis is not None:
            audio_bis = slice_audio(audio_bis, desired_samples, offset)
    else:
        audio = pad_audio(audio, desired_samples)
        if audio_bis is not None:
            audio_bis = pad_audio(audio_bis, desired_samples)
    return (audio, audio_bis) if audio_bis is not None else audio


# --------------------------------------------------------------------------- #
# Speech/noise mixing (NoisyBWE pipeline)
# --------------------------------------------------------------------------- #


def _slice_noise(noise: jnp.ndarray, speech_len: int, rng: jax.Array) -> jnp.ndarray:
    start = jax.random.randint(rng, (), 0, noise.shape[-1] - speech_len)
    return jax.lax.dynamic_slice_in_dim(noise, start, speech_len, axis=-1)


def mix_speech_and_noise_with_rescaling(
    speech_batch: List[jnp.ndarray],
    noise_batch: List[jnp.ndarray],
    rng: jax.Array,
    snr_range: Tuple[float, float] = (-3.0, 5.0),
) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
    """Mix clean speech with noise at per-sample uniform-random SNR (dB).

    Reference: ``vibravox/utils.py:118-193``.
    """
    if len(speech_batch) != len(noise_batch):
        raise ValueError("speech_batch and noise_batch must have the same length")
    corrupted, scaled = [], []
    for speech, noise in zip(speech_batch, noise_batch):
        if speech.ndim != 1 or noise.ndim != 1:
            raise ValueError("Each sample must be a 1D tensor")
        if noise.shape[-1] < speech.shape[-1]:
            raise ValueError("noise must be at least as long as speech")
        rng, k_start, k_snr = jax.random.split(rng, 3)
        noise_sliced = _slice_noise(noise, speech.shape[-1], k_start)
        speech_power = jnp.mean(speech**2)
        noise_power = jnp.mean(noise**2)
        snr = jax.random.uniform(k_snr, (), minval=snr_range[0], maxval=snr_range[1])
        scale = jnp.sqrt(speech_power / (noise_power * 10.0 ** (snr / 10.0)))
        noise_sliced = noise_sliced * scale
        corrupted.append(speech + noise_sliced)
        scaled.append(noise_sliced)
    return corrupted, scaled


def mix_speech_and_noise_without_rescaling(
    speech_batch: List[jnp.ndarray],
    noise_batch: List[jnp.ndarray],
    rng: jax.Array,
) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
    """Mix clean speech with an unscaled random noise slice.

    Reference: ``vibravox/utils.py:195-254``.
    """
    if len(speech_batch) != len(noise_batch):
        raise ValueError("speech_batch and noise_batch must have the same length")
    corrupted, sliced_all = [], []
    for speech, noise in zip(speech_batch, noise_batch):
        if speech.ndim != 1 or noise.ndim != 1:
            raise ValueError("Each sample must be a 1D tensor")
        if noise.shape[-1] < speech.shape[-1]:
            raise ValueError("noise must be at least as long as speech")
        rng, k_start = jax.random.split(rng)
        noise_sliced = _slice_noise(noise, speech.shape[-1], k_start)
        corrupted.append(speech + noise_sliced)
        sliced_all.append(noise_sliced)
    return corrupted, sliced_all
