"""PQMF filterbank tests: reconstruction SNR, shapes, design properties.

The reference only has a ``__main__`` SNR self-check (``pqmf.py:235-253``);
these are proper tests of the same properties plus band separation.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vibravox_tpu.ops.pqmf import PQMF, design_pqmf_bank, optimal_cutoff_ratio


@pytest.mark.parametrize("decimation,kernel_size", [(4, 32), (4, 128), (8, 64), (32, 1024)])
def test_reconstruction_snr(decimation, kernel_size, rng_np):
    pqmf = PQMF(decimation=decimation, kernel_size=kernel_size)
    x = jnp.asarray(rng_np.random((2, 48009, 1)).astype(np.float32))
    x = pqmf.cut_tensor(x)
    rec = pqmf.synthesis(pqmf.analysis(x))
    assert rec.shape == x.shape
    err = np.asarray(x - rec)
    snr = 10 * np.log10(np.mean(np.asarray(rec) ** 2) / np.mean(err**2))
    assert snr > 40.0, f"reconstruction SNR too low: {snr:.1f} dB"


def test_analysis_shapes():
    pqmf = PQMF(decimation=4, kernel_size=32)
    x = jnp.zeros((2, 8000, 1))
    bands = pqmf.analysis(x)
    assert bands.shape == (2, pqmf.analysis_length(8000), 4)
    two = pqmf.analysis(x, bands=2)
    assert two.shape[2] == 2
    # partial analysis equals the first channels of the full analysis
    np.testing.assert_allclose(np.asarray(bands[..., :2]), np.asarray(two))


def test_cut_tensor_lengths():
    pqmf = PQMF(decimation=4, kernel_size=32)
    for t in [1000, 1001, 1023, 4096]:
        v = pqmf.valid_length(t)
        assert v <= t and (v + 32) % 4 == 0


def test_cutoff_in_valid_range():
    for m, k in [(4, 32), (8, 64)]:
        c = optimal_cutoff_ratio(m, k, 9.0)
        assert abs(c - 1 / (2 * m)) <= 1 / (4 * m)


def test_band_separation():
    """A pure low-frequency tone should land almost entirely in band 0."""
    m, k = 4, 512
    pqmf = PQMF(decimation=m, kernel_size=k)
    sr = 16000
    t = np.arange(16384) / sr
    tone = np.sin(2 * np.pi * 500 * t).astype(np.float32)  # 500 Hz < sr/(2m) = 2 kHz
    x = pqmf.cut_tensor(jnp.asarray(tone)[None, :, None])
    bands = np.asarray(pqmf.analysis(x))[0]
    energies = (bands**2).sum(axis=0)
    assert energies[0] / energies.sum() > 0.99


def test_design_deterministic_and_cached():
    a1, s1 = design_pqmf_bank(4, 32, 9.0)
    a2, s2 = design_pqmf_bank(4, 32, 9.0)
    assert a1 is a2 and s1 is s2  # lru_cache
    assert a1.shape == (4, 32) and s1.shape == (4, 32)
