"""Streaming (IterableDataset) data path: the reference supports
``streaming=True`` end-to-end for fit (``bwe.py:108``); these tests pin the
generator-backed source + shuffle-buffer loader that replaces the map-style
index path when the source has no length."""

import numpy as np
import pytest

from vibravox_tpu.data.loader import DataLoader
from vibravox_tpu.data.sources import _HFIterableSource, load_hf_vibravox


class _FakeStream:
    """Minimal stand-in for a ``datasets.IterableDataset`` (torchcodec gates
    real Audio casting offline)."""

    def __init__(self, n=11, column_names=None):
        self.n = n
        self.column_names = column_names
        self.cast_calls = []
        self.removed = []

    def __iter__(self):
        for i in range(self.n):
            yield {
                "audio.throat_microphone": {
                    "array": np.full(100, i, np.float32), "sampling_rate": 16000,
                },
                "audio.headset_microphone": {
                    "array": np.full(100, -i, np.float32), "sampling_rate": 16000,
                },
                "speaker_id": str(i % 3),
            }

    def cast_column(self, col, feature):
        self.cast_calls.append(col)
        return self

    def remove_columns(self, cols):
        self.removed = cols
        return self


def _collate(items):
    return {
        "x": np.stack([it["audio_body_conducted"] for it in items]),
        "y": np.stack([it["audio_airborne"] for it in items]),
    }


RENAME = {
    "audio.throat_microphone": "audio_body_conducted",
    "audio.headset_microphone": "audio_airborne",
}


class TestStreamingSource:
    def test_iterates_and_converts(self):
        src = _HFIterableSource(_FakeStream(4), RENAME, 16000)
        rows = list(src)
        assert len(rows) == 4
        assert rows[2]["audio_body_conducted"][0] == 2.0
        assert rows[2]["audio_airborne"][0] == -2.0
        assert rows[2]["speaker_id"] == "2"

    def test_no_len_or_getitem(self):
        src = _HFIterableSource(_FakeStream(4), RENAME, 16000)
        with pytest.raises(TypeError):
            len(src)
        with pytest.raises(TypeError):
            src[0]


class TestStreamingLoader:
    def _source(self, n=11):
        return _HFIterableSource(_FakeStream(n), RENAME, 16000)

    def test_batches_cover_stream_once(self):
        dl = DataLoader(self._source(11), _collate, batch_size=4, shuffle=False)
        batches = list(dl)
        assert [b["x"].shape[0] for b in batches] == [4, 4, 3]
        seen = sorted(float(v) for b in batches for v in b["x"][:, 0])
        assert seen == [float(i) for i in range(11)]

    def test_drop_last(self):
        dl = DataLoader(self._source(11), _collate, batch_size=4, drop_last=True)
        assert [b["x"].shape[0] for b in dl] == [4, 4]

    def test_shuffle_buffer_permutes_but_covers(self):
        dl = DataLoader(self._source(32), _collate, batch_size=8, shuffle=True, seed=1)
        dl.shuffle_buffer = 8
        batches = list(dl)
        seen = sorted(float(v) for b in batches for v in b["x"][:, 0])
        assert seen == [float(i) for i in range(32)]
        first_epoch = [float(v) for b in batches for v in b["x"][:, 0]]
        assert first_epoch != sorted(first_epoch)  # actually shuffled

    def test_len_raises(self):
        dl = DataLoader(self._source(), _collate, batch_size=4)
        with pytest.raises(TypeError):
            len(dl)


class TestLoadHFStreaming:
    def test_streaming_returns_iterable_source(self, monkeypatch):
        import datasets as hfd

        stream = _FakeStream(3, column_names=None)
        monkeypatch.setattr(hfd, "load_dataset", lambda *a, **k: stream)
        src = load_hf_vibravox(
            "Cnam-LMSSC/vibravox", "speech_clean", "train",
            sensor="throat_microphone", sample_rate=16000, streaming=True,
        )
        assert isinstance(src, _HFIterableSource)
        # unknown columns -> removal skipped, both audio columns cast
        assert stream.removed == []
        assert sorted(stream.cast_calls) == sorted(RENAME)
        assert len(list(src)) == 3

    def test_streaming_with_known_columns_removes_extras(self, monkeypatch):
        import datasets as hfd

        stream = _FakeStream(3, column_names=list(RENAME) + ["extra", "speaker_id"])
        monkeypatch.setattr(hfd, "load_dataset", lambda *a, **k: stream)
        load_hf_vibravox(
            "Cnam-LMSSC/vibravox", "speech_clean", "train",
            sensor="throat_microphone", sample_rate=16000, streaming=True,
        )
        assert stream.removed == ["extra"]


class _MapSource:
    """Tiny map-style source: item i is a length-4 vector of value i."""

    def __init__(self, n=24):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {
            "audio_body_conducted": np.full(4, i, np.float32),
            "audio_airborne": np.full(4, -i, np.float32),
        }


class TestLoaderDeterminism:
    """Concurrency/state gates for the prefetch loader (core hazards the
    reference delegates to torch DataLoader workers)."""

    def _orders(self, dl, epochs=2):
        return [
            [float(v) for b in dl for v in b["x"][:, 0]] for _ in range(epochs)
        ]

    def test_len_is_side_effect_free(self):
        a = DataLoader(_MapSource(), _collate, batch_size=4, shuffle=True, seed=7)
        b = DataLoader(_MapSource(), _collate, batch_size=4, shuffle=True, seed=7)
        len(a), len(a), len(a)  # must not perturb the shuffle stream
        assert self._orders(a) == self._orders(b)

    def test_prefetch_stream_equals_serial_stream(self):
        a = DataLoader(_MapSource(), _collate, batch_size=4, shuffle=True,
                       seed=3, prefetch=2)
        b = DataLoader(_MapSource(), _collate, batch_size=4, shuffle=True,
                       seed=3, prefetch=0)
        oa, ob = self._orders(a), self._orders(b)
        assert oa == ob
        assert oa[0] != oa[1]  # epochs reshuffle

    def test_abandoned_iterator_releases_worker_thread(self):
        import gc
        import threading
        import time

        baseline = threading.active_count()
        dl = DataLoader(_MapSource(64), _collate, batch_size=4, prefetch=2)
        for _ in range(5):  # example-batch draws + limit_train_batches breaks
            for batch in dl:
                break
        gc.collect()
        deadline = time.monotonic() + 5.0
        while threading.active_count() > baseline and time.monotonic() < deadline:
            time.sleep(0.05)
        assert threading.active_count() <= baseline
