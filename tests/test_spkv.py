"""SPKV stack tests: pair generation, datamodule, ECAPA embedder, EER/minDCF."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vibravox_tpu.data.spkv import SPKVDataModule, generate_trial_pairs
from vibravox_tpu.metrics.verification import (
    embedding_distance_stats,
    equal_error_rate,
    minimum_detection_cost,
    roc_curve,
)
from vibravox_tpu.models.ecapa_tdnn import ECAPATDNN
from vibravox_tpu.tasks.ecapa2_spkv import SPKVTask


class TestVerificationMetrics:
    def test_perfect_separation(self):
        scores = np.array([0.9, 0.8, 0.95, 0.1, 0.2, 0.05])
        labels = np.array([1, 1, 1, 0, 0, 0])
        assert equal_error_rate(scores, labels)["eer"] == 0.0
        assert minimum_detection_cost(scores, labels)["min_dcf"] == 0.0

    def test_random_scores_eer_near_half(self):
        rng = np.random.default_rng(0)
        scores = rng.random(4000)
        labels = rng.integers(0, 2, 4000)
        eer = equal_error_rate(scores, labels)["eer"]
        assert 0.45 < eer < 0.55

    def test_roc_monotonic(self):
        rng = np.random.default_rng(1)
        far, frr, thr = roc_curve(rng.random(100), rng.integers(0, 2, 100))
        assert (np.diff(far) >= 0).all()
        assert (np.diff(thr) <= 0).all()

    def test_embedding_stats(self):
        scores = np.array([1.0, 0.9, 0.0, 0.1])
        labels = np.array([1, 1, 0, 0])
        stats = embedding_distance_stats(scores, labels)
        assert stats["mean_same"] == pytest.approx(0.95)
        assert stats["mean_different"] == pytest.approx(0.05)


class TestTrialPairs:
    """Reference construction (ref scripts/gen_pairs_for_spkv.py:91-186);
    bit-exact parity with the committed pickles is in test_spkv_pairs.py."""

    # speaker-sorted, contiguous blocks with unequal counts (5, 7, 5, 6)
    SPEAKERS = ["0"] * 5 + ["1"] * 7 + ["2"] * 5 + ["3"] * 6
    GENDERS = ["female"] * 5 + ["male"] * 7 + ["female"] * 5 + ["male"] * 6

    def test_construction_and_determinism(self):
        p1 = generate_trial_pairs(self.SPEAKERS, self.GENDERS, seed=7)
        p2 = generate_trial_pairs(self.SPEAKERS, self.GENDERS, seed=7)
        assert p1 == p2
        # min_utterances=5 → C(5,2)=10 per speaker: 40 same + 40 different,
        # same-speaker section first
        assert len(p1) == 80
        assert all(self.SPEAKERS[a] == self.SPEAKERS[b] for a, b in p1[:40])
        assert all(self.SPEAKERS[a] != self.SPEAKERS[b] for a, b in p1[40:])
        # every different-speaker pair's target lies in its speaker's range
        # and ranges are TRUNCATED to min_utterances: speaker 1's indices
        # 10-11 and speaker 3's index 22 never appear
        used = {i for pair in p1 for i in pair}
        assert used.isdisjoint({10, 11, 22})

    def test_same_gender_policy_stays_within_gender(self):
        pairs = generate_trial_pairs(self.SPEAKERS, self.GENDERS, "same_gender", seed=7)
        assert len(pairs) == 80
        assert all(self.GENDERS[a] == self.GENDERS[b] for a, b in pairs)

    def test_non_contiguous_speakers_rejected(self):
        with pytest.raises(ValueError):
            generate_trial_pairs(["a", "b", "a"], ["male"] * 3)


@pytest.fixture(scope="module")
def spkv_dm():
    dm = SPKVDataModule(dataset_name="synthetic", synthetic_size=12)
    dm.setup("test")
    return dm


class TestSPKVDataModule:
    def test_paired_loader_structure(self, spkv_dm):
        loader = spkv_dm.test_dataloader()
        batch = next(iter(loader))
        assert set(batch) == {"sensor_a", "sensor_b"}
        for side in batch.values():
            assert {"audio", "speaker_id", "sentence_id", "gender", "sensor"} <= set(side)
            assert side["audio"].ndim == 2

    def test_pair_count(self, spkv_dm):
        # 4 synthetic speakers × 3 utterances → min_utterances=3, C(3,2)=3:
        # 4×3 same + 4×3 different = 24 trials (reference construction)
        assert len(spkv_dm.test_dataloader()) == 24


class TestSPKVTask:
    def test_full_eval_pipeline(self, spkv_dm):
        from vibravox_tpu.core.loop import Trainer

        # tiny embedder for CPU speed
        task = SPKVTask(embedder=ECAPATDNN(channels=32, embed_dim=16, n_mels=20, scale=4))
        trainer = Trainer(limit_test_batches=6)
        metrics = trainer.test(task, spkv_dm, ckpt_path=None)
        assert "test/equal_error_rate" in metrics
        assert "test/minimum_dcf" in metrics
        assert "test/cosine_mean_same" in metrics
        assert 0.0 <= metrics["test/equal_error_rate"] <= 1.0
