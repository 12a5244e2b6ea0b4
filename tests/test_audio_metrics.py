"""Property tests for the hand-rolled audio metrics (STOI, SI-SDR).

An external oracle (pystoi/torchmetrics) is unreachable on this machine
(zero egress, neither package installed — see PARITY.md); these pin the
implementation to the defining properties of Taal 2011 / SI-SDR instead:
identity score, monotonicity in SNR, invariances, and closed-form values
where they exist.
"""

import numpy as np
import pytest

from vibravox_tpu.metrics.audio import si_sdr, stoi

import jax.numpy as jnp


def _speechlike(rng, seconds=3.0, fs=16000):
    """Syllabically modulated broadband noise — energy in every one-third
    octave band, envelope structure for the silent-frame removal."""
    from scipy import signal as sps

    t = np.arange(int(seconds * fs)) / fs
    b, a = sps.butter(4, [80 / (fs / 2), 6000 / (fs / 2)], btype="band")
    sig = sps.lfilter(b, a, rng.standard_normal(t.shape))
    env = 0.55 + 0.45 * np.sin(2 * np.pi * 2.5 * t)  # syllabic modulation
    sig = (sig * env).astype(np.float64)
    return sig / np.abs(sig).max()


class TestSTOI:
    def test_identity_is_one(self, rng_np):
        x = _speechlike(rng_np)
        assert stoi(x, x, 16000) > 0.99

    def test_monotone_in_snr(self, rng_np):
        x = _speechlike(rng_np)
        noise = rng_np.standard_normal(x.shape)
        noise /= np.linalg.norm(noise) / np.linalg.norm(x)
        scores = [
            stoi(x, x + noise * 10 ** (-snr / 20), 16000)
            for snr in (20.0, 5.0, -5.0)
        ]
        assert scores[0] > scores[1] > scores[2]
        assert scores[0] > 0.85  # clean-ish stays intelligible
        assert scores[2] < 0.75  # heavy noise clearly degrades

    def test_range(self, rng_np):
        x = _speechlike(rng_np)
        y = rng_np.standard_normal(x.shape)  # unrelated noise
        s = stoi(x, y, 16000)
        assert -0.5 <= s <= 1.0

    def test_extended_identity(self, rng_np):
        x = _speechlike(rng_np)
        assert stoi(x, x, 16000, extended=True) > 0.99

    def test_scale_invariant_reference_gain(self, rng_np):
        """Classic STOI normalizes each segment's energy: a uniform gain on
        the degraded signal must not change the score."""
        x = _speechlike(rng_np)
        noise = 0.1 * rng_np.standard_normal(x.shape)
        a = stoi(x, x + noise, 16000)
        b = stoi(x, 3.0 * (x + noise), 16000)
        assert abs(a - b) < 1e-6


class TestSISDR:
    def test_identity_is_inf_like(self, rng_np):
        x = jnp.asarray(rng_np.standard_normal((2, 8000)).astype(np.float32))
        assert float(si_sdr(x, x)) > 60  # eps-limited, effectively infinite

    def test_known_value(self, rng_np):
        """preds = target + orthogonal error with ||e||/||t|| = 0.1
        ⇒ SI-SDR = 20 dB exactly."""
        t = rng_np.standard_normal(8000)
        e = rng_np.standard_normal(8000)
        e -= e @ t / (t @ t) * t  # orthogonalize
        e *= 0.1 * np.linalg.norm(t) / np.linalg.norm(e)
        v = si_sdr(jnp.asarray((t + e)[None], jnp.float32), jnp.asarray(t[None], jnp.float32))
        np.testing.assert_allclose(float(v), 20.0, atol=0.05)

    def test_scale_invariance(self, rng_np):
        t = jnp.asarray(rng_np.standard_normal((1, 8000)).astype(np.float32))
        p = t + 0.05 * jnp.asarray(rng_np.standard_normal((1, 8000)).astype(np.float32))
        a = float(si_sdr(p, t))
        b = float(si_sdr(2.5 * p, t))
        np.testing.assert_allclose(a, b, atol=1e-3)
