"""Noisy BWE data module: synthetic speech+noise mixing + real noisy eval.

Mirrors ``NoisyBWELightningDataModule``
(``lightning_datamodules/noisybwe.py:14-290``) and ``SpeechNoiseDataset``
(``datasets/speech_noise.py:6-59``): three subsets (clean coupled speech,
speechless noise, real noisy speech); train/val/test synthetic pairs mix a
*random* noise slice into the body-conducted channel without rescaling;
real noisy loaders have no airborne reference (pad-only collate, the
reference-free metric path downstream).  Val/test return
``{"synthetic": ..., "real": ...}`` loader dicts.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

from vibravox_tpu.data.collate import BWECollate, parse_collate_strategy
from vibravox_tpu.data.loader import DataLoader
from vibravox_tpu.data.sources import SyntheticVibravoxSource

__all__ = ["NoisyBWEDataModule", "SpeechNoiseSource", "NoisyBWECollate"]


class SpeechNoiseSource:
    """Pairs each speech item with a random noise item per access
    (``speech_noise.py:51-59`` — fresh random pairing on every epoch)."""

    def __init__(self, speech_source, noise_source, seed: int = 0):
        self.speech = speech_source
        self.noise = noise_source
        self.rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return len(self.speech)

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        speech = self.speech[idx]
        noise = self.noise[int(self.rng.integers(len(self.noise)))]
        return {
            "audio_airborne": speech["audio_airborne"],
            "audio_body_conducted": speech["audio_body_conducted"],
            "audio_body_conducted_speechless_noisy": noise["audio_body_conducted_speechless_noisy"],
        }


class _SyntheticNoiseSource:
    """Speechless noise: filtered noise bursts, longer than typical speech."""

    def __init__(self, n: int, sample_rate: int, split: str, seconds: float = 8.0):
        self.n = n
        self.sample_rate = sample_rate
        self.seconds = seconds
        self.base_seed = hash(split) % (2**31)

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.default_rng(self.base_seed + i)
        t = int(self.seconds * self.sample_rate)
        noise = rng.standard_normal(t).astype(np.float32)
        # band-limit for realism
        spec = np.fft.rfft(noise)
        freqs = np.fft.rfftfreq(t, 1 / self.sample_rate)
        spec *= 1.0 / (1.0 + (freqs / 1500.0) ** 2)
        noise = np.fft.irfft(spec, n=t).astype(np.float32) * 0.1
        return {"audio_body_conducted_speechless_noisy": noise}


class NoisyBWECollate:
    """Mix noise into the body-conducted channel, then fixed-length collate.

    Mirrors ``noisybwe.py:230-290``: no-reference batches (real noisy data)
    get pad-only collate; synthetic batches are mixed *without rescaling*
    then cropped/padded with coupled alignment, then augmented.
    """

    def __init__(
        self,
        sample_rate: int,
        strategy: str = "constant_length-2500-ms",
        deterministic: bool = False,
        augmentation=None,
        seed: int = 0,
    ):
        self.sample_rate = sample_rate
        self.strategy = strategy
        self.deterministic = deterministic
        self.rng = np.random.default_rng(seed)
        self._bwe_collate = BWECollate(
            sample_rate, strategy=strategy, deterministic=deterministic,
            augmentation=augmentation, seed=seed,
        )

    def __call__(self, samples: Sequence[Dict]) -> Dict[str, np.ndarray]:
        if "audio_airborne" not in samples[0]:
            # real noisy data: pad-only, no reference (``noisybwe.py:244-249``)
            bodies = [np.asarray(s["audio_body_conducted"], np.float32).reshape(-1) for s in samples]
            longest = max(len(b) for b in bodies)
            padded = np.stack([np.pad(b, (0, longest - len(b))) for b in bodies])
            return {"audio_body_conducted": padded[:, :, None]}

        mixed = []
        for s in samples:
            speech = np.asarray(s["audio_body_conducted"], np.float32).reshape(-1)
            noise = np.asarray(s["audio_body_conducted_speechless_noisy"], np.float32).reshape(-1)
            if len(noise) < len(speech):
                noise = np.tile(noise, int(np.ceil(len(speech) / len(noise))))
            start = int(self.rng.integers(0, len(noise) - len(speech) + 1))
            mixed.append(
                {
                    "audio_body_conducted": speech + noise[start : start + len(speech)],
                    "audio_airborne": np.asarray(s["audio_airborne"], np.float32).reshape(-1),
                }
            )
        return self._bwe_collate(mixed)


class NoisyBWEDataModule:
    def __init__(
        self,
        sample_rate: int = 16000,
        dataset_name: str = "Cnam-LMSSC/vibravox",
        sensor: str = "rigid_in_ear_microphone",
        collate_strategy: str = "constant_length-2500-ms",
        streaming: bool = False,
        batch_size: int = 32,
        num_workers: int = 4,
        data_augmentation=None,
        synthetic_size: int = 16,
        seed: int = 42,
        **_unused,
    ):
        self.sample_rate = sample_rate
        self.dataset_name = dataset_name
        self.sensor = sensor
        self.collate_strategy = collate_strategy
        self.streaming = streaming
        self.batch_size = batch_size
        self.data_augmentation = data_augmentation
        self.synthetic_size = synthetic_size
        self.seed = seed
        self._sources: Dict[str, object] = {}

    # ------------------------------------------------------------------ #

    def _speech_source(self, split: str):
        if self.dataset_name == "synthetic":
            return SyntheticVibravoxSource(
                n_utterances=self.synthetic_size, sample_rate=self.sample_rate,
                split=f"speech_clean-{split}",
            )
        from vibravox_tpu.data.sources import load_hf_vibravox

        return load_hf_vibravox(
            self.dataset_name, "speech_clean", split, self.sensor, self.sample_rate,
            self.streaming,
        )

    def _noise_source(self, split: str):
        if self.dataset_name == "synthetic":
            return _SyntheticNoiseSource(
                max(4, self.synthetic_size // 2), self.sample_rate, f"noise-{split}"
            )
        from vibravox_tpu.data.sources import load_hf_vibravox

        src = load_hf_vibravox(
            self.dataset_name, "speechless_noisy", split, self.sensor,
            self.sample_rate, self.streaming, reference_sensor=None,
        )

        class _Rename:
            def __len__(self_inner):
                return len(src)

            def __getitem__(self_inner, i):
                return {
                    "audio_body_conducted_speechless_noisy": src[i]["audio_body_conducted"]
                }

        return _Rename()

    def _real_noisy_source(self, split: str):
        if self.dataset_name == "synthetic":
            clean = SyntheticVibravoxSource(
                n_utterances=max(2, self.synthetic_size // 2),
                sample_rate=self.sample_rate, split=f"speech_noisy-{split}",
            )

            class _NoRef:
                def __len__(self_inner):
                    return len(clean)

                def __getitem__(self_inner, i):
                    return {"audio_body_conducted": clean[i]["audio_body_conducted"]}

            return _NoRef()
        from vibravox_tpu.data.sources import load_hf_vibravox

        src = load_hf_vibravox(
            self.dataset_name, "speech_noisy", split, self.sensor, self.sample_rate,
            self.streaming, reference_sensor=None,
        )

        class _NoRefHF:
            def __len__(self_inner):
                return len(src)

            def __getitem__(self_inner, i):
                return {"audio_body_conducted": src[i]["audio_body_conducted"]}

        return _NoRefHF()

    def setup(self, stage: str = "fit") -> None:
        if stage in ("fit", "validate"):
            if "train" not in self._sources and stage == "fit":
                self._sources["train"] = SpeechNoiseSource(
                    self._speech_source("train"), self._noise_source("train"), self.seed
                )
            if "val_synth" not in self._sources:
                self._sources["val_synth"] = SpeechNoiseSource(
                    self._speech_source("validation"), self._noise_source("validation"),
                    self.seed + 1,
                )
                self._sources["val_real"] = self._real_noisy_source("validation")
        if stage == "test":
            self._sources["test_synth"] = SpeechNoiseSource(
                self._speech_source("test"), self._noise_source("test"), self.seed + 2
            )
            self._sources["test_real"] = self._real_noisy_source("test")

    # ------------------------------------------------------------------ #

    def _collate(self, deterministic: bool) -> NoisyBWECollate:
        return NoisyBWECollate(
            self.sample_rate, self.collate_strategy, deterministic,
            augmentation=None if deterministic else self.data_augmentation,
            seed=self.seed,
        )

    def train_dataloader(self) -> DataLoader:
        return DataLoader(
            self._sources["train"], self._collate(False), self.batch_size,
            shuffle=True, drop_last=True, seed=self.seed,
        )

    def val_dataloader(self) -> Dict[str, DataLoader]:
        return {
            "synthetic": DataLoader(self._sources["val_synth"], self._collate(True), 1),
            "real": DataLoader(self._sources["val_real"], self._collate(True), 1),
        }

    def test_dataloader(self) -> Dict[str, DataLoader]:
        return {
            "synthetic": DataLoader(self._sources["test_synth"], self._collate(True), 1),
            "real": DataLoader(self._sources["test_real"], self._collate(True), 1),
        }
