"""SPKV trial-pair loading against the reference's committed pickles.

The reference ships its real trial lists as pickles of ``(index_a,
index_b)`` tuples over the speaker-sorted test split
(``/root/reference/vibravox/lightning_datamodules/spkv.py:226-242``;
fixtures under ``configs/lightning_datamodule/spkv_pairs/``).  These tests
drive :class:`SPKVDataModule`'s ``pairs_file`` path with those exact files —
a real-data check of the pickle format, the index pairing, and the paired
test loader — using a metadata-only source sized to the pickles' index
range (the audio content is irrelevant to the pairing contract).
"""

import os
import pickle

import pytest

from vibravox_tpu.data.spkv import SPKVDataModule

_PAIRS_DIR = "/root/reference/configs/lightning_datamodule/spkv_pairs"
_CI_FIXTURE = os.path.join(_PAIRS_DIR, "vibravox-test/speech_clean/mixed_gender.pkl")
_MAIN_FIXTURE = os.path.join(_PAIRS_DIR, "mixed_gender.pkl")

requires_pairs = pytest.mark.skipif(
    not os.path.isdir(_PAIRS_DIR), reason="reference SPKV pickles not mounted"
)


class _MetaOnlySource:
    """Rows with metadata + short dummy audio; mirrors the speaker/sentence
    structure the pickles were generated against (several rows per speaker)."""

    def __init__(self, n: int):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        import numpy as np

        return {
            "audio": np.full((16,), float(i), dtype=np.float32),
            "speaker_id": f"spk_{i // 4:03d}",
            "sentence_id": int(i),
            "gender": "male" if (i // 4) % 2 == 0 else "female",
        }


class _PairsOnlyDataModule(SPKVDataModule):
    """SPKVDataModule with the dataset swapped for a metadata-only source —
    everything downstream of ``_load_split`` (sort, pickle, pairing,
    loaders) is the production code path."""

    def __init__(self, n_rows: int, **kw):
        super().__init__(dataset_name="synthetic", **kw)
        self._n_rows = n_rows

    def _load_split(self, split, sensor):
        return _MetaOnlySource(self._n_rows)


@requires_pairs
class TestReferencePairPickles:
    def test_ci_fixture_loads_with_correct_count_and_pairing(self):
        with open(_CI_FIXTURE, "rb") as f:
            pairs = pickle.load(f)
        assert len(pairs) == 96
        n_rows = max(max(a, b) for a, b in pairs) + 1  # 48

        dm = _PairsOnlyDataModule(n_rows, pairs_file=_CI_FIXTURE, batch_size=1)
        dm.setup("test")
        loader = dm.test_dataloader()
        assert len(loader) == 96

        # reconstruct the reference's speaker-sorted view and check every
        # emitted pair is exactly (sorted[a], sorted[b])
        src = _MetaOnlySource(n_rows)
        order = sorted(range(n_rows), key=lambda i: str(src[i]["speaker_id"]))
        for (a, b), batch in zip(pairs, loader):
            row_a = src[order[a]]
            row_b = src[order[b]]
            assert batch["sensor_a"]["sentence_id"][0] == row_a["sentence_id"]
            assert batch["sensor_b"]["sentence_id"][0] == row_b["sentence_id"]
            assert batch["sensor_a"]["speaker_id"][0] == row_a["speaker_id"]
            assert batch["sensor_b"]["speaker_id"][0] == row_b["speaker_id"]

    def test_ci_fixture_has_target_and_nontarget_trials(self):
        with open(_CI_FIXTURE, "rb") as f:
            pairs = pickle.load(f)
        n_rows = max(max(a, b) for a, b in pairs) + 1
        dm = _PairsOnlyDataModule(n_rows, pairs_file=_CI_FIXTURE, batch_size=1)
        dm.setup("test")
        same = diff = 0
        for batch in dm.test_dataloader():
            if batch["sensor_a"]["speaker_id"][0] == batch["sensor_b"]["speaker_id"][0]:
                same += 1
            else:
                diff += 1
        # a usable verification trial list needs both classes
        assert same > 0 and diff > 0

    def test_main_98k_pickle_loads_end_to_end(self):
        with open(_MAIN_FIXTURE, "rb") as f:
            pairs = pickle.load(f)
        assert len(pairs) == 98532
        n_rows = max(max(a, b) for a, b in pairs) + 1  # 3001

        dm = _PairsOnlyDataModule(n_rows, pairs_file=_MAIN_FIXTURE, batch_size=1)
        dm.setup("test")
        loader = dm.test_dataloader()
        assert len(loader) == 98532
        # spot-check the head of the stream (full iteration is O(100k) rows)
        for k, batch in enumerate(loader):
            assert batch["sensor_a"]["audio"].shape == (1, 16)
            if k >= 4:
                break

    def test_same_gender_fixture_pairs_respect_policy_metadata(self):
        path = os.path.join(_PAIRS_DIR, "vibravox-test/speech_clean/same_gender.pkl")
        with open(path, "rb") as f:
            pairs = pickle.load(f)
        assert len(pairs) == 96
        assert all(isinstance(a, int) and isinstance(b, int) for a, b in pairs)


@requires_pairs
class TestPairGeneratorReferenceParity:
    """``generate_trial_pairs`` reproduces the reference's committed pickles
    BIT-FOR-BIT.

    The speaker statistics (per-speaker index ranges, min_utterances, gender
    partition) are recovered from the pickles themselves: the same-speaker
    section is the deterministic per-speaker ``combinations`` output, so the
    block offsets give the ranges, and the same-gender list's block order
    (males first) gives the gender split.  Regenerating both lists from one
    ``random.Random(42)`` stream (mixed first — the reference script's order
    under ``seed_everything(42)``, ref ``scripts/gen_pairs_for_spkv.py:
    209-223``) must then reproduce every pair, including the random
    different-speaker draws."""

    @staticmethod
    def _recover_stats(mixed, same_gender):
        import math

        m = 1
        while mixed[m - 1][0] == 0:
            m += 1
        k = math.comb(m, 2)
        n_speakers = (len(mixed) // 2) // k
        offsets = [mixed[i * k][0] for i in range(n_speakers)]
        offsets_g = [same_gender[i * k][0] for i in range(n_speakers)]
        split = next(
            (i for i in range(1, n_speakers) if offsets_g[i] < offsets_g[i - 1]),
            n_speakers,
        )
        male_offsets = set(offsets_g[:split])
        max_idx = max(max(a, b) for a, b in mixed)
        counts = [offsets[i + 1] - offsets[i] for i in range(n_speakers - 1)]
        counts.append(max(max_idx + 1 - offsets[-1], m))
        speaker_ids, genders = [], []
        for i, c in enumerate(counts):
            speaker_ids += [f"{i:03d}"] * c
            genders += ["male" if offsets[i] in male_offsets else "female"] * c
        return speaker_ids, genders

    @pytest.mark.parametrize(
        "subdir,expected_len",
        [("", 98532), ("vibravox-test/speech_clean", 96), ("vibravox-test/speech_noisy", 96)],
    )
    def test_bit_identical_regeneration(self, subdir, expected_len):
        import random

        from vibravox_tpu.data.spkv import generate_trial_pairs

        base = os.path.join(_PAIRS_DIR, subdir)
        with open(os.path.join(base, "mixed_gender.pkl"), "rb") as f:
            mixed = pickle.load(f)
        with open(os.path.join(base, "same_gender.pkl"), "rb") as f:
            same_gender = pickle.load(f)
        assert len(mixed) == len(same_gender) == expected_len

        speaker_ids, genders = self._recover_stats(mixed, same_gender)
        rng = random.Random(42)
        assert generate_trial_pairs(speaker_ids, genders, "mixed_gender", rng=rng) == mixed
        assert (
            generate_trial_pairs(speaker_ids, genders, "same_gender", rng=rng)
            == same_gender
        )


class TestSpeakerSortOrder:
    """speaker_sort_order must use the column's NATIVE dtype like the
    reference's dataset.sort("speaker_id") — a str() key diverges on numeric
    ids ('10' < '2' lexicographically) and silently breaks pickle parity
    (round-4 advisor finding)."""

    def test_numeric_ids_sort_numerically(self):
        from vibravox_tpu.data.spkv import speaker_sort_order

        src = [{"speaker_id": sid} for sid in [10, 2, 1, 21, 3]]
        order = speaker_sort_order(src)
        assert [src[i]["speaker_id"] for i in order] == [1, 2, 3, 10, 21]

    def test_string_ids_sort_lexicographically_and_stably(self):
        from vibravox_tpu.data.spkv import speaker_sort_order

        src = [
            {"speaker_id": "10", "u": 0},
            {"speaker_id": "2", "u": 0},
            {"speaker_id": "2", "u": 1},
            {"speaker_id": "1", "u": 0},
        ]
        order = speaker_sort_order(src)
        assert [src[i]["speaker_id"] for i in order] == ["1", "10", "2", "2"]
        # stable: within-speaker row order preserved
        assert [src[i]["u"] for i in order] == [0, 0, 0, 1]
