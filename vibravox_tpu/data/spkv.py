"""SPKV (speaker verification) data module.

Mirrors ``SPKVLightningDataModule`` (``lightning_datamodules/spkv.py:16-348``):
fit-stage per-sensor selection (with 50/50 interleave when the two sensors
differ), and a test stage that sorts by ``speaker_id``, loads precomputed
trial pairs (pickle of (index_a, index_b) tuples), and yields paired batches
``{"sensor_a": ..., "sensor_b": ...}`` with audio + speaker/sentence/gender
metadata — the CombinedLoader(min_size) equivalent is a plain zip.
"""

from __future__ import annotations

import pickle
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from vibravox_tpu.data.loader import DataLoader
from vibravox_tpu.data.sources import SyntheticVibravoxSource

__all__ = ["SPKVDataModule", "SPKVCollate", "generate_trial_pairs"]


class SPKVCollate:
    """Pad audio to the batch max and pass metadata through
    (ref ``spkv.py:309-348``)."""

    def __init__(self, sensor: str):
        self.sensor = sensor

    def __call__(self, samples: Sequence[Dict]) -> Dict:
        audios = [np.asarray(s["audio"], dtype=np.float32).reshape(-1) for s in samples]
        longest = max(a.shape[-1] for a in audios)
        padded = np.stack([np.pad(a, (0, longest - len(a))) for a in audios])
        return {
            "audio": padded,
            "speaker_id": [s.get("speaker_id", "?") for s in samples],
            "sentence_id": [s.get("sentence_id", -1) for s in samples],
            "gender": [s.get("gender", "?") for s in samples],
            "sensor": [self.sensor] * len(samples),
        }


def generate_trial_pairs(
    speaker_ids: Sequence[str],
    genders: Sequence[str],
    n_pairs: int,
    gender_policy: str = "mixed_gender",
    seed: int = 42,
) -> List[Tuple[int, int]]:
    """Brydinskyi-style trial list: ~50% same-speaker pairs, seeded.

    The equivalent of ``scripts/gen_pairs_for_spkv.py`` (223 LoC there);
    ``gender_policy`` ∈ {mixed_gender, same_gender}.
    """
    rng = np.random.default_rng(seed)
    by_speaker: Dict[str, List[int]] = {}
    for i, spk in enumerate(speaker_ids):
        by_speaker.setdefault(spk, []).append(i)
    speakers = sorted(by_speaker)
    pairs: List[Tuple[int, int]] = []
    attempts = 0
    while len(pairs) < n_pairs and attempts < n_pairs * 50:
        attempts += 1
        if rng.random() < 0.5 and any(len(v) > 1 for v in by_speaker.values()):
            spk = speakers[rng.integers(len(speakers))]
            if len(by_speaker[spk]) < 2:
                continue
            a, b = rng.choice(by_speaker[spk], size=2, replace=False)
        else:
            if len(speakers) < 2:
                continue
            s1, s2 = rng.choice(len(speakers), size=2, replace=False)
            a = by_speaker[speakers[s1]][rng.integers(len(by_speaker[speakers[s1]]))]
            b = by_speaker[speakers[s2]][rng.integers(len(by_speaker[speakers[s2]]))]
            if gender_policy == "same_gender" and genders[a] != genders[b]:
                continue
        pairs.append((int(a), int(b)))
    return pairs


class _SelectedSource:
    def __init__(self, base, indices: Sequence[int], field_map: Dict[str, str]):
        self.base = base
        self.indices = list(indices)
        self.field_map = field_map

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i):
        row = self.base[self.indices[i]]
        out = dict(row)
        for src, dst in self.field_map.items():
            if src in row:
                out[dst] = row[src]
        return out


class SPKVDataModule:
    def __init__(
        self,
        sample_rate: int = 16000,
        dataset_name: str = "Cnam-LMSSC/vibravox",
        subset: str = "speech_clean",
        sensor_a: str = "headset_microphone",
        sensor_b: str = "headset_microphone",
        pairs_file: Optional[str] = None,
        gender_policy: str = "mixed_gender",
        streaming: bool = False,
        batch_size: int = 1,
        num_workers: int = 1,
        synthetic_size: int = 24,
        n_synthetic_pairs: int = 96,
        seed: int = 42,
        **_unused,
    ):
        assert not streaming, "streaming is not supported for SPKV test stage"
        self.sample_rate = sample_rate
        self.dataset_name = dataset_name
        self.subset = subset
        self.sensor_a = sensor_a
        self.sensor_b = sensor_b
        self.pairs_file = pairs_file
        self.gender_policy = gender_policy
        self.batch_size = batch_size
        self.synthetic_size = synthetic_size
        self.n_synthetic_pairs = n_synthetic_pairs
        self.seed = seed
        self._test_sources = None

    # ------------------------------------------------------------------ #

    def _load_split(self, split: str, sensor: str):
        if self.dataset_name == "synthetic":
            base = SyntheticVibravoxSource(
                n_utterances=self.synthetic_size, sample_rate=self.sample_rate,
                split=f"spkv-{split}", with_metadata=True,
            )

            class _Audio:
                def __init__(self, b):
                    self.b = b

                def __len__(self):
                    return len(self.b)

                def __getitem__(self, i):
                    row = self.b[i]
                    return {
                        "audio": row["audio_body_conducted"],
                        "speaker_id": row["speaker_id"],
                        "sentence_id": row["sentence_id"],
                        "gender": row["gender"],
                    }

            return _Audio(base)
        from vibravox_tpu.data.sources import load_hf_vibravox

        src = load_hf_vibravox(
            self.dataset_name, self.subset, split, sensor, self.sample_rate,
            streaming=False, reference_sensor=None,
        )

        class _Adapter:
            def __len__(self_inner):
                return len(src)

            def __getitem__(self_inner, i):
                row = src[i]
                return {
                    "audio": row["audio_body_conducted"],
                    "speaker_id": row.get("speaker_id", "?"),
                    "sentence_id": row.get("sentence_id", -1),
                    "gender": row.get("gender", "?"),
                }

        return _Adapter()

    def setup(self, stage: str = "test") -> None:
        if stage != "test":
            # fit stage: per-sensor sources, 50/50 interleave when the two
            # sensors differ (ref ``spkv.py:173-181``); the shipped eval task
            # is inference-only so this feeds custom training tasks
            if "fit" in (stage, None) and not hasattr(self, "_fit_source"):
                src_a = self._load_split("train", self.sensor_a)
                if self.sensor_b != self.sensor_a:
                    src_b = self._load_split("train", self.sensor_b)

                    class _Interleaved:
                        def __len__(self_inner):
                            return 2 * min(len(src_a), len(src_b))

                        def __getitem__(self_inner, i):
                            return (src_a if i % 2 == 0 else src_b)[i // 2]

                    self._fit_source = _Interleaved()
                else:
                    self._fit_source = src_a
            return
        src_a = self._load_split("test", self.sensor_a)
        src_b = self._load_split("test", self.sensor_b) if self.sensor_b != self.sensor_a else src_a

        # sort by speaker_id like the reference (``spkv.py:202``)
        order = sorted(range(len(src_a)), key=lambda i: str(src_a[i]["speaker_id"]))
        rows = [src_a[i] for i in order]

        if self.pairs_file:
            with open(self.pairs_file, "rb") as f:
                pairs = pickle.load(f)
        else:
            pairs = generate_trial_pairs(
                [str(r["speaker_id"]) for r in rows],
                [str(r["gender"]) for r in rows],
                self.n_synthetic_pairs,
                self.gender_policy,
                seed=self.seed,
            )
        idx_a = [order[a] for a, _ in pairs]
        idx_b = [order[b] for _, b in pairs]
        self._test_sources = (
            _SelectedSource(src_a, idx_a, {}),
            _SelectedSource(src_b, idx_b, {}),
        )

    # ------------------------------------------------------------------ #

    def train_dataloader(self):
        if getattr(self, "_fit_source", None) is None:
            return iter(())  # inference-only eval: empty train loader
        return DataLoader(
            self._fit_source, SPKVCollate(self.sensor_a), self.batch_size, shuffle=True
        )

    def val_dataloader(self):
        return iter(())

    def test_dataloader(self):
        src_a, src_b = self._test_sources
        loader_a = DataLoader(src_a, SPKVCollate(self.sensor_a), self.batch_size)
        loader_b = DataLoader(src_b, SPKVCollate(self.sensor_b), self.batch_size)

        class _Paired:
            def __len__(self):
                return min(len(loader_a), len(loader_b))

            def __iter__(self):
                for a, b in zip(loader_a, loader_b):
                    yield {"sensor_a": a, "sensor_b": b}

        return _Paired()
