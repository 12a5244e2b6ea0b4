"""BWE data module: coupled body-conducted / airborne speech.

Mirrors ``BWELightningDataModule`` (``lightning_datamodules/bwe.py:24-293``):
loads a vibravox subset for one sensor with the headset mic as reference,
constant-length or pad collate (random crop in train, centered in eval),
augmentation inside the collate, optional secondary dataset adding extra
val/test loaders, val/test batch size semantics (val ``min(1, batch//4)``≡1,
test 1).

Source resolution order: explicit ``source_factory`` > local npz directory >
HF hub (requires network/cache) > deterministic synthetic data when
``dataset_name_principal`` is 'synthetic'.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

from vibravox_tpu.data.collate import BWECollate
from vibravox_tpu.data.loader import DataLoader
from vibravox_tpu.data.sources import (
    NpzDirectorySource,
    SyntheticVibravoxSource,
    load_hf_vibravox,
)

LIST_OF_VIBRAVOX = [
    "Cnam-LMSSC/vibravox",
    "Cnam-LMSSC/vibravox2",
    "Cnam-LMSSC/vibravox-test",
    "Cnam-LMSSC/vibravox_enhanced_by_EBEN",
    "Cnam-LMSSC/vibravox_mixed_for_spkv",
]

__all__ = ["BWEDataModule", "LIST_OF_VIBRAVOX"]


def _resolve_source(name: str, subset: str, split: str, sensor: str, sample_rate: int,
                    streaming: bool, synthetic_size: int = 16):
    import os

    if name == "synthetic" or name is None:
        return SyntheticVibravoxSource(
            n_utterances=synthetic_size, sample_rate=sample_rate, split=f"{subset}-{split}"
        )
    if os.path.isdir(name):
        return NpzDirectorySource(os.path.join(name, split), sample_rate=sample_rate)
    return load_hf_vibravox(name, subset, split, sensor, sample_rate, streaming)


class BWEDataModule:
    def __init__(
        self,
        sample_rate: int = 16000,
        dataset_name_principal: str = "Cnam-LMSSC/vibravox",
        dataset_name_secondary: Optional[str] = None,
        subset: str = "speech_clean",
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
        self.dataset_name_principal = dataset_name_principal
        self.dataset_name_secondary = dataset_name_secondary
        self.subset = subset
        self.sensor = sensor
        self.collate_strategy = collate_strategy
        self.streaming = streaming
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.data_augmentation = data_augmentation
        self.synthetic_size = synthetic_size
        self.seed = seed
        self._sources: Dict[str, object] = {}

    # ------------------------------------------------------------------ #

    def setup(self, stage: str = "fit") -> None:
        splits = {"fit": ["train", "validation"], "validate": ["validation"], "test": ["test"]}[stage]
        for split in splits:
            key = f"principal/{split}"
            if key not in self._sources:
                self._sources[key] = _resolve_source(
                    self.dataset_name_principal, self.subset, split, self.sensor,
                    self.sample_rate, self.streaming, self.synthetic_size,
                )
            if self.dataset_name_secondary and split != "train":
                key2 = f"secondary/{split}"
                if key2 not in self._sources:
                    self._sources[key2] = _resolve_source(
                        self.dataset_name_secondary, self.subset, split, self.sensor,
                        self.sample_rate, self.streaming, self.synthetic_size,
                    )

    # ------------------------------------------------------------------ #

    def _collate(self, deterministic: bool) -> BWECollate:
        return BWECollate(
            self.sample_rate,
            strategy=self.collate_strategy,
            deterministic=deterministic,
            augmentation=None if deterministic else self.data_augmentation,
            seed=self.seed,
        )

    def train_dataloader(self) -> DataLoader:
        return DataLoader(
            self._sources["principal/train"],
            collate_fn=self._collate(deterministic=False),
            batch_size=self.batch_size,
            shuffle=True,
            drop_last=True,
            seed=self.seed,
        )

    def val_dataloader(self):
        # reference: val batch size min(1, batch_size//4) ≡ 1 (``bwe.py:177``)
        loaders = {
            "principal": DataLoader(
                self._sources["principal/validation"],
                collate_fn=self._collate(deterministic=True),
                batch_size=1,
                shuffle=False,
            )
        }
        if "secondary/validation" in self._sources:
            loaders["secondary"] = DataLoader(
                self._sources["secondary/validation"],
                collate_fn=self._collate(deterministic=True),
                batch_size=1,
                shuffle=False,
            )
        return loaders if len(loaders) > 1 else loaders["principal"]

    def test_dataloader(self):
        loaders = {
            "principal": DataLoader(
                self._sources["principal/test"],
                collate_fn=self._collate(deterministic=True),
                batch_size=1,
                shuffle=False,
            )
        }
        if "secondary/test" in self._sources:
            loaders["secondary"] = DataLoader(
                self._sources["secondary/test"],
                collate_fn=self._collate(deterministic=True),
                batch_size=1,
                shuffle=False,
            )
        return loaders if len(loaders) > 1 else loaders["principal"]
