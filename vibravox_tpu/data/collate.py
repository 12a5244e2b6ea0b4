"""Constant-shape batching for the TPU input pipeline.

The reference supports two collate strategies (``bwe.py:232-293``):
``pad`` (pad to the longest in the batch) and ``constant_length-XXXX-ms``
(random crop in train / centered in eval, pad when shorter).  Under XLA the
constant-length strategy is the native fit; ``pad`` additionally rounds the
batch max up to a bucket multiple so the number of compiled shapes stays
bounded (the reference's ``pad_to_multiple_of=128`` trick, generalized).

Augmentation runs at the batch level after cropping — like the reference's
in-collate augmentation (``bwe.py:284-288``) — and the batch is then
re-fixed to the target length (speed perturbation changes length; XLA needs
the constant shape back).  All randomness is host-side numpy, mirroring the
reference's CPU-collate RNG placement.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence

import jax
import numpy as np

__all__ = ["parse_collate_strategy", "BWECollate"]


def parse_collate_strategy(strategy: str, sample_rate: int) -> Optional[int]:
    """'pad' -> None; 'constant_length-2500-ms' -> samples."""
    if strategy == "pad":
        return None
    m = re.fullmatch(r"constant_length-(\d+)-ms", strategy)
    if not m:
        raise ValueError(f"Unknown collate strategy: {strategy!r}")
    return int(sample_rate * int(m.group(1)) / 1000)


def _fix_length(
    audio: np.ndarray, desired: int, rng: np.random.Generator, deterministic: bool,
    coupled: Optional[np.ndarray] = None,
):
    """Crop (random/centered) or symmetric-pad the trailing axis, keeping an
    optional coupled signal aligned with the same offset."""
    t = audio.shape[-1]
    if t >= desired:
        off = (t - desired) // 2 if deterministic else int(rng.integers(0, t - desired + 1))
        out = audio[..., off : off + desired]
        out2 = coupled[..., off : off + desired] if coupled is not None else None
    else:
        left = (desired - t) // 2
        right = desired - t - left
        pad = [(0, 0)] * (audio.ndim - 1) + [(left, right)]
        out = np.pad(audio, pad)
        out2 = np.pad(coupled, pad) if coupled is not None else None
    return (out, out2) if coupled is not None else out


def _fix_length_at(
    audio: np.ndarray, desired: int, offset: int, coupled: Optional[np.ndarray] = None
):
    """`_fix_length` with the crop offset supplied by the caller (numpy twin
    of the native `vx_collate_pair` row kernel)."""
    t = audio.shape[-1]
    if t >= desired:
        out = audio[..., offset : offset + desired]
        out2 = coupled[..., offset : offset + desired] if coupled is not None else None
    else:
        left = (desired - t) // 2
        right = desired - t - left
        pad = [(0, 0)] * (audio.ndim - 1) + [(left, right)]
        out = np.pad(audio, pad)
        out2 = np.pad(coupled, pad) if coupled is not None else None
    return (out, out2) if coupled is not None else out


class BWECollate:
    """Collate coupled (body_conducted, airborne) utterances into NWC batches.

    Returns ``{"audio_body_conducted": (B, T, 1), "audio_airborne": (B, T, 1)}``
    float32 numpy, ready for ``device_put``.
    """

    def __init__(
        self,
        sample_rate: int,
        strategy: str = "constant_length-2500-ms",
        deterministic: bool = False,
        augmentation=None,
        pad_multiple: int = 1024,
        seed: int = 0,
    ):
        self.sample_rate = sample_rate
        self.constant_samples = parse_collate_strategy(strategy, sample_rate)
        self.deterministic = deterministic
        self.augmentation = augmentation
        self.pad_multiple = pad_multiple
        self.rng = np.random.default_rng(seed)
        self._jax_rng = jax.random.key(seed)

    def __call__(self, samples: Sequence[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
        has_reference = "audio_airborne" in samples[0]

        if self.constant_samples is not None:
            target = self.constant_samples
        else:  # 'pad': bucket the batch max to bound compiled shapes
            longest = max(s["audio_body_conducted"].shape[-1] for s in samples)
            target = -(-longest // self.pad_multiple) * self.pad_multiple

        raw_bodies = [
            np.asarray(s["audio_body_conducted"], dtype=np.float32).reshape(-1)
            for s in samples
        ]
        raw_airs = (
            [np.asarray(s["audio_airborne"], dtype=np.float32).reshape(-1) for s in samples]
            if has_reference
            else None
        )
        # crop offsets drawn here, in sample order, whichever assembly path
        # runs below — the native and numpy batches are byte-identical
        offsets = [
            (
                ((t - target) // 2)
                if self.deterministic
                else int(self.rng.integers(0, t - target + 1))
            )
            if (t := b.shape[-1]) >= target
            else 0
            for b in raw_bodies
        ]

        from vibravox_tpu.native import pipeline as native

        if native.native_available():
            # single-copy batch assembly in the C++ kernel (each utterance is
            # written once, directly into its batch row, across a thread pool)
            body_batch, air_batch = native.collate_pair(
                raw_bodies, raw_airs, offsets, target
            )
        else:
            bodies: List[np.ndarray] = []
            airs: List[np.ndarray] = []
            for i, body in enumerate(raw_bodies):
                if has_reference:
                    body, air = _fix_length_at(body, target, offsets[i], raw_airs[i])
                    airs.append(air)
                else:
                    body = _fix_length_at(body, target, offsets[i])
                bodies.append(body)
            body_batch = np.stack(bodies)
            air_batch = np.stack(airs) if has_reference else None

        batch = {"audio_body_conducted": body_batch}
        if has_reference:
            batch["audio_airborne"] = air_batch

        if self.augmentation is not None and not self.deterministic:
            self._jax_rng, k = jax.random.split(self._jax_rng)
            w1, w2 = self.augmentation(
                jax.numpy.asarray(batch["audio_body_conducted"]),
                jax.numpy.asarray(batch["audio_airborne"]) if has_reference else None,
                rng=self.rng,
                jax_rng=k,
            )
            w1 = np.asarray(w1)
            w2 = np.asarray(w2) if w2 is not None else None
            # restore the constant length after length-changing transforms
            if w1.shape[-1] != target:
                if w2 is not None:
                    w1, w2 = _fix_length(w1, target, self.rng, self.deterministic, w2)
                else:
                    w1 = _fix_length(w1, target, self.rng, self.deterministic)
            batch["audio_body_conducted"] = w1
            if w2 is not None:
                batch["audio_airborne"] = w2

        return {k: v[:, :, None] for k, v in batch.items()}
