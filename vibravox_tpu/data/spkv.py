"""SPKV (speaker verification) data module.

Mirrors ``SPKVLightningDataModule`` (``lightning_datamodules/spkv.py:16-348``):
fit-stage per-sensor selection (with 50/50 interleave when the two sensors
differ), and a test stage that sorts by ``speaker_id``, loads precomputed
trial pairs (pickle of (index_a, index_b) tuples), and yields paired batches
``{"sensor_a": ..., "sensor_b": ...}`` with audio + speaker/sentence/gender
metadata — the CombinedLoader(min_size) equivalent is a plain zip.
"""

from __future__ import annotations

import itertools
import math
import pickle
import random
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from vibravox_tpu.data.loader import DataLoader
from vibravox_tpu.data.sources import SyntheticVibravoxSource

__all__ = ["SPKVDataModule", "SPKVCollate", "generate_trial_pairs", "speaker_ranges"]


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


def speaker_sort_order(src) -> List[int]:
    """Row order sorted by the ``speaker_id`` column's NATIVE dtype, matching
    the reference's ``dataset.sort("speaker_id")``
    (``lightning_datamodules/spkv.py:202``, ``scripts/gen_pairs_for_spkv.py:30``)
    — HF sorts by the column dtype, so a ``str()`` key would silently diverge
    on numeric ids (``'10' < '2'`` lexicographically) and break the
    bit-identical-pickle parity.  The sort is stable, preserving within-speaker
    row order like the reference's."""
    return sorted(range(len(src)), key=lambda i: src[i]["speaker_id"])


def speaker_ranges(speaker_ids: Sequence[str]) -> Tuple[List[List[int]], int]:
    """Per-speaker index ranges truncated to the minimum utterance count.

    The reference's ``generate_ranges_per_speaker``
    (``scripts/gen_pairs_for_spkv.py:94-124``): over a dataset SORTED by
    ``speaker_id``, each speaker occupies one contiguous index block;
    ``ranges[i]`` is the FIRST ``min_utterances`` indices of speaker *i*'s
    block (offsets accumulate the FULL per-speaker counts, so the tail of a
    longer block is simply never paired).  Returns ``(ranges,
    min_utterances)``.
    """
    counts: List[int] = []
    seen: Dict[str, int] = {}
    last: Optional[str] = None
    for sid in map(str, speaker_ids):
        if sid != last:
            if sid in seen:
                raise ValueError(
                    f"speaker {sid!r} is not contiguous — sort by speaker_id first"
                )
            seen[sid] = len(counts)
            counts.append(0)
            last = sid
        counts[seen[sid]] += 1
    if not counts:
        return [], 0
    min_utterances = min(counts)
    offset = 0
    ranges = []
    for c in counts:
        ranges.append(list(range(offset, offset + min_utterances)))
        offset += c
    return ranges, min_utterances


def generate_trial_pairs(
    speaker_ids: Sequence[str],
    genders: Sequence[str],
    gender_policy: str = "mixed_gender",
    seed: int = 42,
    rng: Optional[random.Random] = None,
) -> List[Tuple[int, int]]:
    """The reference's trial-list construction, exactly
    (``scripts/gen_pairs_for_spkv.py:91-186``).

    For every speaker: ALL same-speaker ``combinations(range_i, 2)`` (ranges
    truncated to ``min_utterances``, see :func:`speaker_ranges`), plus a
    structurally matched ``comb(min_utterances, 2)`` random different-speaker
    pairs — target drawn from the speaker's own range, partner as a (other
    speaker, utterance slot) double draw.  All same-speaker pairs precede all
    different-speaker pairs in the output.  ``same_gender`` runs the same
    construction within each gender group (males first, then females — the
    gender of a speaker's first utterance decides, non-"male" counting as
    female, matching ``get_gender_per_speaker``).

    Randomness comes from :mod:`random` (Mersenne Twister) through the same
    ``choices`` call sequence as the reference, so with identical speaker
    statistics and a fresh ``Random(42)`` the output is bit-identical to a
    reference run under ``seed_everything(42)``.  Pass ``rng`` to continue an
    existing stream (the reference script generates the mixed- then the
    same-gender list from ONE seeded stream — see
    ``vibravox_tpu/scripts/gen_pairs_for_spkv.py``).
    """
    if rng is None:
        rng = random.Random(seed)
    ranges, min_utterances = speaker_ranges(speaker_ids)
    nb_speakers = len(ranges)
    k = math.comb(min_utterances, 2)

    if gender_policy == "same_gender":
        males = [i for i in range(nb_speakers) if str(genders[ranges[i][0]]) == "male"]
        females = [i for i in range(nb_speakers) if str(genders[ranges[i][0]]) != "male"]
        groups = [males, females]
    else:
        groups = [list(range(nb_speakers))]

    same: List[Tuple[int, int]] = []
    different: List[Tuple[int, int]] = []
    for group in groups:
        for speaker in group:
            same += list(itertools.combinations(ranges[speaker], r=2))
            other_speakers = [i for i in group if i != speaker]
            # draw order matters for stream parity with the reference:
            # targets, then partner speakers, then partner utterance slots
            targets = rng.choices(ranges[speaker], k=k)
            partner_speaker = rng.choices(other_speakers, k=k)
            partner_slot = rng.choices(range(min_utterances), k=k)
            different += list(
                zip(targets, (ranges[s][u] for s, u in zip(partner_speaker, partner_slot)))
            )
    return [(int(a), int(b)) for a, b in same + different]


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

        # sort by speaker_id like the reference (``spkv.py:202``) — native
        # column dtype, see speaker_sort_order
        order = speaker_sort_order(src_a)
        rows = [src_a[i] for i in order]

        if self.pairs_file:
            with open(self.pairs_file, "rb") as f:
                pairs = pickle.load(f)
        else:
            pairs = generate_trial_pairs(
                [str(r["speaker_id"]) for r in rows],
                [str(r["gender"]) for r in rows],
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
