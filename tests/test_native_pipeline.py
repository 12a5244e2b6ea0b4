"""Native host-pipeline kernels (C++) vs their python/numpy twins.

The collate parity is exact (byte equality): both paths consume the same
host RNG stream, so a silent divergence would change training batches.  The
resampler is pinned against both the numpy twin and the device (XLA conv)
resampler from ``ops/resample.py``.
"""

import numpy as np
import pytest

from vibravox_tpu.native import pipeline as native
from vibravox_tpu.data.collate import BWECollate

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="native toolchain unavailable"
)


def _pair_samples(rng, n, lengths):
    samples = []
    for i in range(n):
        t = lengths[i % len(lengths)]
        samples.append(
            {
                "audio_body_conducted": rng.standard_normal(t).astype(np.float32),
                "audio_airborne": rng.standard_normal(t).astype(np.float32),
            }
        )
    return samples


class TestNativeCollate:
    @pytest.mark.parametrize("deterministic", [False, True])
    def test_byte_parity_with_numpy_path(self, deterministic, monkeypatch):
        rng = np.random.default_rng(7)
        # lengths straddling the 2000-sample target: crop, exact, and pad rows
        samples = _pair_samples(rng, 6, [3000, 2000, 1200, 2501])

        def run(force_fallback):
            if force_fallback:
                monkeypatch.setattr(native, "native_available", lambda: False)
            else:
                monkeypatch.undo()
            collate = BWECollate(
                sample_rate=16000, strategy="constant_length-125-ms",
                deterministic=deterministic, seed=11,
            )
            return collate(samples)

        a = run(False)
        b = run(True)
        for key in ("audio_body_conducted", "audio_airborne"):
            assert a[key].shape == b[key].shape == (6, 2000, 1)
            np.testing.assert_array_equal(a[key], b[key])

    def test_no_reference_branch(self):
        rng = np.random.default_rng(3)
        samples = [
            {"audio_body_conducted": rng.standard_normal(t).astype(np.float32)}
            for t in (900, 2500)
        ]
        collate = BWECollate(
            sample_rate=16000, strategy="constant_length-125-ms",
            deterministic=True,
        )
        out = collate(samples)
        assert out["audio_body_conducted"].shape == (2, 2000, 1)
        assert "audio_airborne" not in out
        # padded row: symmetric zero pad of the 900-sample utterance
        row = out["audio_body_conducted"][0, :, 0]
        left = (2000 - 900) // 2
        assert np.all(row[:left] == 0) and np.all(row[left + 900 :] == 0)
        np.testing.assert_array_equal(
            row[left : left + 900], samples[0]["audio_body_conducted"]
        )

    def test_coupled_pair_shares_offset(self):
        """Cross-sensor alignment: both signals crop at the same offset (the
        property the reference tests by cross-correlation)."""
        rng = np.random.default_rng(5)
        t = 4000
        body = rng.standard_normal(t).astype(np.float32)
        air = body + 1.0  # recognizable coupling
        collate = BWECollate(
            sample_rate=16000, strategy="constant_length-125-ms", seed=2,
        )
        out = collate([{"audio_body_conducted": body, "audio_airborne": air}])
        np.testing.assert_allclose(
            out["audio_airborne"][0, :, 0] - out["audio_body_conducted"][0, :, 0],
            1.0,
            atol=1e-6,
        )


class TestNativeResample:
    @pytest.mark.parametrize("orig,new", [(48000, 16000), (16000, 24000), (24000, 16000)])
    @pytest.mark.parametrize("window", ["kaiser", "hann"])
    def test_vs_numpy_twin(self, orig, new, window):
        rng = np.random.default_rng(1)
        x = rng.standard_normal(orig // 2).astype(np.float32)
        got = native.resample_poly(x, orig, new, window)
        want = native._resample_poly_numpy(x, orig, new, window)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_vs_device_resampler(self):
        import jax.numpy as jnp

        from vibravox_tpu.ops.resample import resample

        rng = np.random.default_rng(2)
        x = rng.standard_normal(12000).astype(np.float32)
        got = native.resample_poly(x, 48000, 16000)
        dev = np.asarray(resample(jnp.asarray(x), 48000, 16000))
        assert got.shape == dev.shape
        np.testing.assert_allclose(got, dev, atol=2e-5)

    def test_identity_rate(self):
        x = np.random.default_rng(0).standard_normal(100).astype(np.float32)
        np.testing.assert_array_equal(native.resample_poly(x, 16000, 16000), x)
