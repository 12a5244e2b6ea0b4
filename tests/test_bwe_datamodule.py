"""BWE datamodule tier-2 tests on the synthetic source.

Mirrors the reference's datamodule integration tests
(``/root/reference/tests/lightning_datamodules/bwe_test.py``): batch
structure for both collate strategies, and the cross-sensor time-alignment
property — the argmax of the cross-correlation between the body-conducted
and airborne signals of each item must sit within ±24 samples (the random
crop must be applied identically to both sensors, ``bwe_test.py:47-68``).
"""

import numpy as np
import pytest

from vibravox_tpu.data.bwe import BWEDataModule


def _make_dm(**kw):
    defaults = dict(
        sample_rate=16000,
        dataset_name_principal="synthetic",
        synthetic_size=6,
        batch_size=2,
        num_workers=0,
    )
    defaults.update(kw)
    return BWEDataModule(**defaults)


class TestBWEBatches:
    @pytest.mark.parametrize("strategy", ["pad", "constant_length-2500-ms"])
    def test_train_batch_structure(self, strategy):
        dm = _make_dm(collate_strategy=strategy)
        dm.setup("fit")
        batch = next(iter(dm.train_dataloader()))
        assert set(batch) >= {"audio_body_conducted", "audio_airborne"}
        a = np.asarray(batch["audio_body_conducted"])
        b = np.asarray(batch["audio_airborne"])
        assert a.shape == b.shape and a.ndim == 3 and a.shape[2] == 1
        assert a.dtype == np.float32
        if strategy.startswith("constant_length"):
            assert a.shape[1] == int(16000 * 2.5)

    def test_val_loader_deterministic(self):
        dm = _make_dm()
        dm.setup("fit")
        b1 = next(iter(dm.val_dataloader()))
        b2 = next(iter(dm.val_dataloader()))
        np.testing.assert_array_equal(
            np.asarray(b1["audio_body_conducted"]),
            np.asarray(b2["audio_body_conducted"]),
        )

    @pytest.mark.parametrize("strategy", ["pad", "constant_length-2500-ms"])
    def test_cross_sensor_alignment(self, strategy):
        """Random cropping must keep both sensors time-aligned: the lag of
        the cross-correlation peak stays within ±24 samples (reference
        ``bwe_test.py:47-68``)."""
        dm = _make_dm(collate_strategy=strategy, batch_size=4)
        dm.setup("fit")
        batch = next(iter(dm.train_dataloader()))
        body = np.asarray(batch["audio_body_conducted"])[:, :, 0]
        air = np.asarray(batch["audio_airborne"])[:, :, 0]
        for i in range(body.shape[0]):
            x = body[i] - body[i].mean()
            y = air[i] - air[i].mean()
            # FFT cross-correlation, restricted to ±1000 lags for speed
            n = len(x)
            corr = np.fft.irfft(np.fft.rfft(x, 2 * n) * np.conj(np.fft.rfft(y, 2 * n)))
            lags = np.concatenate([np.arange(0, 1000), np.arange(-1000, 0)])
            window = np.concatenate([corr[:1000], corr[-1000:]])
            lag = int(lags[np.argmax(np.abs(window))])
            assert abs(lag) <= 24, f"item {i}: sensors misaligned by {lag} samples"
