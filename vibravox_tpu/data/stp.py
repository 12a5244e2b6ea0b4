"""STP (speech-to-phoneme) data module.

Mirrors ``STPLightningDataModule`` (``lightning_datamodules/stp.py:11-261``):
audio + phonemized text, feature-extractor normalization, longest-pad with
``pad_to_multiple_of`` (the reference's GPU-kernel alignment trick doubles
as XLA shape bucketing here — padded shapes land on a small set of
multiples, bounding recompilation), labels masked to −100 where padded,
optional augmentation on the non-deterministic path.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from vibravox_tpu.data.loader import DataLoader
from vibravox_tpu.data.sources import SyntheticVibravoxSource

__all__ = ["STPDataModule", "STPCollate", "SyntheticSTPSource"]


class SyntheticSTPSource(SyntheticVibravoxSource):
    """Synthetic audio + pseudo phoneme strings for offline development/CI."""

    def __init__(self, tokenizer, **kwargs):
        super().__init__(**kwargs)
        self.tokenizer = tokenizer
        # phoneme alphabet without special tokens
        self._alphabet = [
            t for t in tokenizer.get_vocab() if t not in
            {"<unk>", "<pad>", "<s>", "</s>", "|"}
        ]

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        item = super().__getitem__(idx)
        rng = np.random.default_rng(self.base_seed + idx + 10_000)
        n_words = rng.integers(2, 6)
        words = [
            "".join(rng.choice(self._alphabet, size=rng.integers(2, 7)))
            for _ in range(n_words)
        ]
        return {
            "audio": item["audio_body_conducted"],
            "phonemized_text": " ".join(words),
        }


class STPCollate:
    """Feature-extract + tokenize + pad, reproducing ``stp.py:209-261``."""

    def __init__(
        self,
        feature_extractor,
        tokenizer,
        sample_rate: int = 16000,
        deterministic: bool = False,
        augmentation=None,
        pad_to_multiple_of: int = 128,
        audio_bucket_samples: int = 32000,
        seed: int = 0,
    ):
        self.feature_extractor = feature_extractor
        self.tokenizer = tokenizer
        self.sample_rate = sample_rate
        self.deterministic = deterministic
        self.augmentation = augmentation
        self.pad_to_multiple_of = pad_to_multiple_of
        # coarse XLA shape bucket: batch audio pads up to a multiple of this,
        # bounding the number of compiled step variants (the reference's
        # pad_to_multiple_of=128 aligns GPU kernels — ``stp.py:237`` — but
        # 128-sample granularity would mean hundreds of XLA recompiles)
        self.audio_bucket_samples = audio_bucket_samples
        self.rng = np.random.default_rng(seed)
        import jax

        self._jax_rng = jax.random.key(seed)

    def __call__(self, samples: Sequence[Dict]) -> Dict[str, np.ndarray]:
        audios = [np.asarray(s["audio"], dtype=np.float32).reshape(-1) for s in samples]
        phonemes = [s["phonemized_text"] for s in samples]

        audio_processed = self.feature_extractor(
            raw_speech=audios,
            padding="longest",
            return_tensors="np",
            sampling_rate=self.sample_rate,
            pad_to_multiple_of=self.pad_to_multiple_of,
        )
        labels_processed = self.tokenizer(
            text=phonemes,
            padding="longest",
            return_tensors="np",
            pad_to_multiple_of=self.pad_to_multiple_of,
            return_attention_mask=True,
        )
        labels = np.where(
            labels_processed["attention_mask"] == 1,
            labels_processed["input_ids"],
            -100,
        ).astype(np.int32)
        audio = audio_processed["input_values"].astype(np.float32)
        if self.audio_bucket_samples:
            bucket = -(-audio.shape[1] // self.audio_bucket_samples) * self.audio_bucket_samples
            audio = np.pad(audio, [(0, 0), (0, bucket - audio.shape[1])])

        if self.augmentation is not None and not self.deterministic:
            import jax

            self._jax_rng, k = jax.random.split(self._jax_rng)
            aug, _ = self.augmentation(
                jax.numpy.asarray(audio), None, rng=self.rng, jax_rng=k
            )
            aug = np.asarray(aug)
            t = audio.shape[-1]
            if aug.shape[-1] < t:
                aug = np.pad(aug, [(0, 0), (0, t - aug.shape[-1])])
            audio = aug[:, :t]

        return {
            "audio": audio,
            "phonemes_ids": labels,
            "phonemes_str": phonemes,
        }


class STPDataModule:
    LIST_OF_VIBRAVOX = [
        "Cnam-LMSSC/vibravox",
        "Cnam-LMSSC/vibravox2",
        "Cnam-LMSSC/vibravox-test",
        "Cnam-LMSSC/non_curated_vibravox",
        "Cnam-LMSSC/vibravox_enhanced_by_EBEN",
        "synthetic",
    ]

    def __init__(
        self,
        sample_rate: int = 16000,
        dataset_name_principal: str = "Cnam-LMSSC/vibravox",
        dataset_name_secondary: Optional[str] = None,
        subset: str = "speech_clean",
        sensor: str = "headset_microphone",
        streaming: bool = False,
        batch_size: int = 8,
        num_workers: int = 4,
        feature_extractor=None,
        tokenizer=None,
        data_augmentation=None,
        synthetic_size: int = 16,
        seed: int = 42,
        **_unused,
    ):
        assert dataset_name_principal in self.LIST_OF_VIBRAVOX
        self.sample_rate = sample_rate
        self.dataset_name_principal = dataset_name_principal
        self.dataset_name_secondary = dataset_name_secondary
        self.subset = subset
        self.sensor = sensor
        self.streaming = streaming
        self.batch_size = batch_size
        self.num_workers = num_workers
        if feature_extractor is None:
            from transformers import Wav2Vec2FeatureExtractor

            feature_extractor = Wav2Vec2FeatureExtractor(
                feature_size=1, sampling_rate=sample_rate, padding_value=0.0,
                do_normalize=True, return_attention_mask=False,
            )
        if tokenizer is None:
            from vibravox_tpu.data.phonemes import build_phoneme_tokenizer

            tokenizer = build_phoneme_tokenizer()
        self.feature_extractor = feature_extractor
        self.tokenizer = tokenizer
        self.data_augmentation = data_augmentation
        self.synthetic_size = synthetic_size
        self.seed = seed
        self._sources: Dict[str, object] = {}

    # ------------------------------------------------------------------ #

    def _make_source(self, split: str):
        if self.dataset_name_principal == "synthetic":
            return SyntheticSTPSource(
                self.tokenizer, n_utterances=self.synthetic_size,
                sample_rate=self.sample_rate, split=f"stp-{split}",
            )
        from vibravox_tpu.data.sources import load_hf_vibravox

        src = load_hf_vibravox(
            self.dataset_name_principal, self.subset, split, self.sensor,
            self.sample_rate, self.streaming, reference_sensor=None,
        )

        class _Adapter:
            sample_rate = self.sample_rate

            def __len__(self_inner):
                return len(src)

            def __getitem__(self_inner, i):
                row = src[i]
                return {
                    "audio": row["audio_body_conducted"],
                    "phonemized_text": row["phonemized_text"],
                }

        return _Adapter()

    def setup(self, stage: str = "fit") -> None:
        splits = {"fit": ["train", "validation"], "validate": ["validation"], "test": ["test"]}[stage]
        for split in splits:
            if split not in self._sources:
                self._sources[split] = self._make_source(split)

    def _collate(self, deterministic: bool) -> STPCollate:
        return STPCollate(
            self.feature_extractor, self.tokenizer, self.sample_rate,
            deterministic=deterministic,
            augmentation=None if deterministic else self.data_augmentation,
            seed=self.seed,
        )

    def train_dataloader(self) -> DataLoader:
        return DataLoader(
            self._sources["train"], self._collate(False), self.batch_size,
            shuffle=True, drop_last=True, seed=self.seed,
        )

    def val_dataloader(self) -> DataLoader:
        return DataLoader(self._sources["validation"], self._collate(True), self.batch_size)

    def test_dataloader(self) -> DataLoader:
        return DataLoader(self._sources["test"], self._collate(True), 1)
