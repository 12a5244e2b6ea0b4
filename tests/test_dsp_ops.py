"""Tests for the DSP op library: STFT loss, resampling, biquad, audio utils,
augmentation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vibravox_tpu.ops.audio import pad_audio, set_audio_duration, slice_audio
from vibravox_tpu.ops.augment import (
    WaveformDataAugmentation,
    pitch_shift,
    speed_perturbation,
    time_masking_block,
)
from vibravox_tpu.ops.biquad import biquad_apply, biquad_coeffs_lowpass, remove_hf
from vibravox_tpu.ops.resample import KaiserResampler, resample
from vibravox_tpu.ops.stft import MultiResolutionSTFTLoss, stft_magnitude


# --------------------------------------------------------------------------- #
# STFT / multi-res loss
# --------------------------------------------------------------------------- #


class TestMultiResolutionSTFT:
    def setup_method(self):
        self.loss_fn = MultiResolutionSTFTLoss(
            fft_sizes=(512, 1024, 2048),
            hop_sizes=(50, 120, 240),
            win_lengths=(240, 600, 1200),
            sample_rate=16000,
            perceptual_weighting=True,
        )

    def test_zero_on_identity(self, rng_np):
        x = jnp.asarray(rng_np.standard_normal((2, 16000)).astype(np.float32))
        assert float(self.loss_fn(x, x)) == 0.0

    def test_positive_and_scalar(self, rng_np):
        x = jnp.asarray(rng_np.standard_normal((2, 16000)).astype(np.float32))
        y = jnp.asarray(rng_np.standard_normal((2, 16000)).astype(np.float32))
        loss = self.loss_fn(x, y)
        assert loss.shape == () and float(loss) > 0

    def test_differentiable(self, rng_np):
        x = jnp.asarray(rng_np.standard_normal((1, 8000)).astype(np.float32))
        y = jnp.asarray(rng_np.standard_normal((1, 8000)).astype(np.float32))
        g = jax.grad(lambda a: self.loss_fn(a, y))(x)
        assert bool(jnp.all(jnp.isfinite(g)))

    def test_channels_last_input(self, rng_np):
        x = jnp.asarray(rng_np.standard_normal((2, 8000, 1)).astype(np.float32))
        y = jnp.asarray(rng_np.standard_normal((2, 8000, 1)).astype(np.float32))
        l3 = self.loss_fn(x, y)
        l2 = self.loss_fn(x[..., 0], y[..., 0])
        np.testing.assert_allclose(float(l3), float(l2), rtol=1e-6)


def test_stft_magnitude_parseval():
    """Magnitude of a windowed pure tone peaks at the right bin."""
    sr, f0 = 16000, 1000
    x = jnp.asarray(np.sin(2 * np.pi * f0 * np.arange(sr) / sr).astype(np.float32))[None]
    mag = stft_magnitude(x, 512, 128, 512)
    peak_bin = int(jnp.argmax(mag[0, mag.shape[1] // 2]))
    assert abs(peak_bin - round(f0 * 512 / sr)) <= 1


# --------------------------------------------------------------------------- #
# Resampling
# --------------------------------------------------------------------------- #


class TestResample:
    def test_sine_accuracy(self):
        t = np.arange(48000) / 48000
        s = jnp.asarray(np.sin(2 * np.pi * 440 * t).astype(np.float32))[None]
        r = resample(s, 48000, 16000)
        assert r.shape == (1, 16000)
        t16 = np.arange(16000) / 16000
        ref = np.sin(2 * np.pi * 440 * t16)
        assert np.abs(np.asarray(r[0])[100:-100] - ref[100:-100]).max() < 5e-3

    def test_identity(self):
        x = jnp.ones((2, 100))
        assert resample(x, 16000, 16000) is x

    def test_output_length(self):
        rs = KaiserResampler(16000, 24000)
        for t in [1000, 1601, 12345]:
            x = jnp.zeros((1, t))
            assert rs(x).shape[-1] == rs.output_length(t)

    def test_nwc_layout(self):
        x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 4800, 1)).astype(np.float32))
        y = resample(x, 48000, 16000)
        assert y.shape == (2, 1600, 1)


# --------------------------------------------------------------------------- #
# Biquad / remove_hf
# --------------------------------------------------------------------------- #


class TestBiquad:
    def test_against_scipy_lfilter(self, rng_np):
        from scipy.signal import lfilter

        b, a = biquad_coeffs_lowpass(16000, 1000)
        x = rng_np.standard_normal(500).astype(np.float32)
        ours = np.asarray(biquad_apply(jnp.asarray(x), b, a))
        ref = lfilter(np.asarray(b), np.asarray(a), x)
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_remove_hf_attenuates(self, rng_np):
        x = jnp.asarray(rng_np.standard_normal((1, 16000)).astype(np.float32))
        y = remove_hf(x, 16000, 2000)
        assert y.shape == x.shape
        X = np.abs(np.fft.rfft(np.asarray(x[0])))
        Y = np.abs(np.fft.rfft(np.asarray(y[0])))
        f = np.fft.rfftfreq(16000, 1 / 16000)
        assert (Y[f > 4000] ** 2).sum() / (X[f > 4000] ** 2).sum() < 1e-3


# --------------------------------------------------------------------------- #
# Audio utils
# --------------------------------------------------------------------------- #


class TestAudioUtils:
    def test_pad_audio_symmetric(self):
        x = jnp.ones((1, 10))
        y = pad_audio(x, 16)
        assert y.shape == (1, 16)
        assert float(y[0, :3].sum()) == 0 and float(y[0, -3:].sum()) == 0
        assert float(y.sum()) == 10

    def test_slice_audio(self):
        x = jnp.arange(20.0)[None]
        y = slice_audio(x, 5, 3)
        np.testing.assert_array_equal(np.asarray(y[0]), np.arange(3.0, 8.0))

    def test_set_audio_duration_crop_coupled_alignment(self, rng_key, rng_np):
        a = jnp.asarray(rng_np.standard_normal((1, 100)).astype(np.float32))
        b = a * 2.0
        ca, cb = set_audio_duration(a, 40, b, deterministic=False, rng=rng_key)
        # same offset for both: cb must remain exactly 2*ca
        np.testing.assert_allclose(np.asarray(cb), 2 * np.asarray(ca))
        assert ca.shape == (1, 40)

    def test_set_audio_duration_center(self):
        x = jnp.arange(10.0)[None]
        y = set_audio_duration(x, 4, deterministic=True)
        np.testing.assert_array_equal(np.asarray(y[0]), np.arange(3.0, 7.0))

    def test_set_audio_duration_pad(self):
        x = jnp.ones((1, 5))
        y = set_audio_duration(x, 9, deterministic=True)
        assert y.shape == (1, 9) and float(y.sum()) == 5


# --------------------------------------------------------------------------- #
# Augmentation
# --------------------------------------------------------------------------- #


class TestAugmentation:
    def test_speed_changes_length(self, rng_np):
        x = jnp.asarray(rng_np.standard_normal((2, 16000)).astype(np.float32))
        y = speed_perturbation(x, 16000, 1.25)
        assert y.shape[-1] == 12800

    def test_pitch_shift_preserves_length_and_moves_pitch(self):
        sr = 16000
        sine = jnp.asarray(np.sin(2 * np.pi * 440 * np.arange(sr) / sr).astype(np.float32))[None]
        y = pitch_shift(sine, sr, 12)  # one octave up
        assert y.shape == sine.shape
        F = np.abs(np.fft.rfft(np.asarray(y[0]) * np.hanning(sr)))
        dominant = np.argmax(F[200:]) + 200  # ignore DC region
        assert abs(dominant - 880) < 30

    def test_time_masking(self, rng_key, rng_np):
        x = jnp.asarray(rng_np.standard_normal((2, 1000)).astype(np.float32)) + 10.0
        y = time_masking_block(x, 10, rng_key)
        zeros = int((np.asarray(y[0]) == 0).sum())
        assert zeros == 100

    def test_full_pipeline_gating(self, rng_np):
        aug = WaveformDataAugmentation(16000, p_data_augmentation=0.0)
        x = jnp.asarray(rng_np.standard_normal((1, 8000)).astype(np.float32))
        y, _ = aug(x, None, rng=np.random.default_rng(0), jax_rng=jax.random.key(0))
        assert y is x  # gate closed: untouched

    def test_full_pipeline_coupled(self, rng_np):
        aug = WaveformDataAugmentation(
            16000, p_data_augmentation=1.0, p_speed_perturbation=1.0,
            p_pitch_shift=0.0, p_time_masking=1.0,
        )
        x = jnp.asarray(rng_np.standard_normal((1, 8000)).astype(np.float32))
        y1, y2 = aug(x, x, rng=np.random.default_rng(1), jax_rng=jax.random.key(1))
        assert y1.shape == y2.shape
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)


class TestFIRCustomVJP:
    """apply_fir carries a hand-written vjp (forward-conv gradients); it must
    match XLA autodiff of the raw conv formulation exactly."""

    # 1000 % 8 == 0 exercises the space-to-depth packed FIR; 1001 the plain path
    @pytest.mark.parametrize("t", [1000, 1001])
    def test_grads_match_autodiff(self, rng_np, t):
        from vibravox_tpu.ops.conv import conv1d
        from vibravox_tpu.ops.stft import a_weighting_fir, apply_fir

        taps = jnp.asarray(a_weighting_fir(16000))
        k = taps.shape[0]
        x = jnp.asarray(rng_np.standard_normal((3, t)).astype(np.float32))

        def raw(x, taps):
            w = taps[::-1][:, None, None]
            return conv1d(x[:, :, None], w, padding=(k // 2, (k - 1) // 2))[:, :, 0]

        g = jnp.asarray(rng_np.standard_normal((3, t)).astype(np.float32))
        _, vjp_ours = jax.vjp(apply_fir, x, taps)
        _, vjp_ref = jax.vjp(raw, x, taps)
        (dx1, dt1), (dx2, dt2) = vjp_ours(g), vjp_ref(g)
        # atol 1e-5: the packed path reassociates the k101 accumulation
        np.testing.assert_allclose(np.asarray(apply_fir(x, taps)), np.asarray(raw(x, taps)), atol=1e-5)
        np.testing.assert_allclose(np.asarray(dx1), np.asarray(dx2), atol=1e-5)
        np.testing.assert_allclose(np.asarray(dt1), np.asarray(dt2), rtol=1e-4, atol=1e-4)


# --------------------------------------------------------------------------- #
# Pallas fused framed-DFT kernel
# --------------------------------------------------------------------------- #


class TestPallasSTFT:
    @pytest.mark.parametrize("fft,hop,win", [(512, 50, 240), (1024, 120, 600), (2048, 240, 1200)])
    def test_matches_xla_path(self, fft, hop, win, rng_np):
        from vibravox_tpu.ops.pallas_stft import framed_dft_magnitude
        from vibravox_tpu.ops.stft import stft_magnitude

        x = jnp.asarray(rng_np.standard_normal((2, 16000)).astype(np.float32))
        ours = framed_dft_magnitude(x, fft, hop, win)
        ref = stft_magnitude(x, fft, hop, win)
        assert ours.shape == ref.shape
        rel = float(jnp.max(jnp.abs(ours - ref)) / jnp.max(ref))
        assert rel < 1e-5

    def test_loss_with_pallas_flag_matches(self, rng_np):
        x = jnp.asarray(rng_np.standard_normal((2, 16000)).astype(np.float32))
        y = jnp.asarray(rng_np.standard_normal((2, 16000)).astype(np.float32))
        base = MultiResolutionSTFTLoss((512,), (50,), (240,), sample_rate=16000,
                                       perceptual_weighting=True, use_pallas=False)
        pal = MultiResolutionSTFTLoss((512,), (50,), (240,), sample_rate=16000,
                                      perceptual_weighting=True, use_pallas=True)
        np.testing.assert_allclose(float(base(x, y)), float(pal(x, y)), rtol=1e-4)

    def test_pallas_loss_gradient(self, rng_np):
        pal = MultiResolutionSTFTLoss((512,), (50,), (240,), sample_rate=16000,
                                      use_pallas=True)
        x = jnp.asarray(rng_np.standard_normal((1, 8000)).astype(np.float32))
        y = jnp.asarray(rng_np.standard_normal((1, 8000)).astype(np.float32))
        g = jax.grad(lambda a: pal(a, y))(x)
        assert bool(jnp.all(jnp.isfinite(g)))

    @pytest.mark.parametrize("fft,hop,win", [(512, 50, 240), (1024, 120, 600), (2048, 240, 1200)])
    def test_gradient_matches_xla_path(self, fft, hop, win, rng_np):
        """The hand-written Pallas backward must reproduce XLA autodiff of the
        XLA-path forward (same framing, window, clamp, reflect-pad transpose)."""
        from vibravox_tpu.ops.pallas_stft import framed_dft_magnitude
        from vibravox_tpu.ops.stft import stft_magnitude

        x = jnp.asarray(rng_np.standard_normal((2, 6000)).astype(np.float32))
        mag_ref = stft_magnitude(x, fft, hop, win)
        g = jnp.asarray(
            rng_np.standard_normal(mag_ref.shape).astype(np.float32)
        )
        _, vjp_ours = jax.vjp(lambda a: framed_dft_magnitude(a, fft, hop, win), x)
        _, vjp_ref = jax.vjp(lambda a: stft_magnitude(a, fft, hop, win), x)
        (dx_ours,) = vjp_ours(g)
        (dx_ref,) = vjp_ref(g)
        scale = float(jnp.max(jnp.abs(dx_ref)))
        np.testing.assert_allclose(
            np.asarray(dx_ours), np.asarray(dx_ref), atol=2e-4 * scale
        )

    def test_full_loss_gradient_matches_xla(self, rng_np):
        """End-to-end: grad of the 3-resolution perceptual loss, Pallas vs XLA."""
        kw = dict(
            fft_sizes=(512, 1024), hop_sizes=(50, 120), win_lengths=(240, 600),
            sample_rate=16000, perceptual_weighting=True,
        )
        base = MultiResolutionSTFTLoss(use_pallas=False, **kw)
        pal = MultiResolutionSTFTLoss(use_pallas=True, **kw)
        x = jnp.asarray(rng_np.standard_normal((2, 6000)).astype(np.float32))
        y = jnp.asarray(rng_np.standard_normal((2, 6000)).astype(np.float32))
        g_base = jax.grad(lambda a: base(a, y))(x)
        g_pal = jax.grad(lambda a: pal(a, y))(x)
        scale = float(jnp.max(jnp.abs(g_base)))
        # looser than the per-resolution check: the log-magnitude gradient
        # multiplies by 1/|X|, which amplifies f32 accumulation-order noise
        # where |X| sits near the power clamp
        np.testing.assert_allclose(
            np.asarray(g_pal), np.asarray(g_base), atol=5e-3 * scale
        )


# --------------------------------------------------------------------------- #
# Polyphase conv rewrites (transposed-conv forward, strided-conv backward)
# --------------------------------------------------------------------------- #


class TestPolyphaseConv:
    """conv_transpose1d and the strided-conv custom vjp re-express the
    backend-pathological lhs-dilated convs as dense polyphase convs; they must
    match the raw lax formulations exactly."""

    @pytest.mark.parametrize(
        "cin,cout,k,s,pad,op,groups",
        [
            (8, 4, 16, 8, 4, 0, 1),
            (8, 4, 8, 4, 2, 0, 1),
            (6, 6, 4, 2, 1, 0, 1),
            (8, 8, 5, 3, 2, 1, 2),
            (4, 4, 3, 2, 0, 0, 4),
            (4, 8, 7, 1, 3, 0, 1),
        ],
    )
    def test_conv_transpose_matches_lhs_dilated(self, cin, cout, k, s, pad, op, groups, rng_np, monkeypatch):
        from vibravox_tpu.ops.conv import conv_transpose1d

        monkeypatch.setenv("VIBRAVOX_CONV_CUSTOM", "1")
        x = jnp.asarray(rng_np.standard_normal((2, 37, cin)).astype(np.float32))
        w = jnp.asarray(rng_np.standard_normal((cin, cout // groups, k)).astype(np.float32))

        def raw(xx, ww):
            wf = jnp.flip(ww, axis=-1)
            wf = jnp.transpose(wf, (2, 0, 1))
            if groups == 1:
                rhs = wf
            else:
                ipg = cin // groups
                wf = wf.reshape(k, groups, ipg, cout // groups)
                rhs = jnp.transpose(wf, (0, 2, 1, 3)).reshape(k, ipg, cout)
            return jax.lax.conv_general_dilated(
                xx, rhs, window_strides=(1,),
                padding=[(k - 1 - pad, k - 1 - pad + op)],
                lhs_dilation=(s,),
                dimension_numbers=("NWC", "WIO", "NWC"),
                feature_group_count=groups,
            )

        ours = conv_transpose1d(x, w, stride=s, padding=pad, output_padding=op, groups=groups)
        ref = raw(x, w)
        assert ours.shape == ref.shape
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)

        # gradients of the polyphase formulation vs the raw one
        g = jnp.asarray(rng_np.standard_normal(ref.shape).astype(np.float32))
        _, vjp_ours = jax.vjp(lambda a, b: conv_transpose1d(a, b, stride=s, padding=pad, output_padding=op, groups=groups), x, w)
        _, vjp_ref = jax.vjp(raw, x, w)
        for do, dr in zip(vjp_ours(g), vjp_ref(g)):
            np.testing.assert_allclose(np.asarray(do), np.asarray(dr), atol=2e-4)

    @pytest.mark.parametrize(
        "cin,cout,k,s,pad,groups",
        [
            (16, 64, 41, 4, 20, 4),
            (1, 16, 15, 4, 7, 1),
            (32, 64, 4, 2, 1, 1),
            (64, 128, 8, 4, 3, 1),
            (128, 256, 16, 8, 7, 1),
            (12, 12, 5, 3, (1, 2), 3),
        ],
    )
    def test_strided_conv_custom_vjp_matches_autodiff(self, cin, cout, k, s, pad, groups, rng_np, monkeypatch):
        from vibravox_tpu.ops.conv import _conv1d_raw, conv1d

        monkeypatch.setenv("VIBRAVOX_CONV_CUSTOM", "1")
        x = jnp.asarray(rng_np.standard_normal((2, 103, cin)).astype(np.float32))
        w = jnp.asarray(rng_np.standard_normal((k, cin // groups, cout)).astype(np.float32))
        padt = (pad, pad) if isinstance(pad, int) else pad

        ours_fn = lambda a, b: conv1d(a, b, stride=s, padding=pad, groups=groups)
        ref_fn = lambda a, b: _conv1d_raw(a, b, s, padt, 1, groups)

        ours, ref = ours_fn(x, w), ref_fn(x, w)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)

        g = jnp.asarray(rng_np.standard_normal(ref.shape).astype(np.float32))
        _, vjp_ours = jax.vjp(ours_fn, x, w)
        _, vjp_ref = jax.vjp(ref_fn, x, w)
        for do, dr in zip(vjp_ours(g), vjp_ref(g)):
            np.testing.assert_allclose(np.asarray(do), np.asarray(dr), atol=2e-4)


class TestResamplerOracle:
    """Functional oracle for the Kaiser resampler: analytic ground-truth
    signals through the rate pairs the framework actually uses (48k->16k
    dataset decode, 24k->16k metrics path, 16k->8k MelGAN scale).  torchaudio
    is not installed here; the analytic signal IS the reference."""

    @pytest.mark.parametrize("window", ["kaiser", "hann"])
    @pytest.mark.parametrize("src,dst", [(48000, 16000), (24000, 16000), (16000, 8000)])
    def test_chirp_ground_truth(self, src, dst, window):
        dur = 1.0
        f0, f1 = 100.0, min(src, dst) * 0.2  # deep passband
        t_in = np.arange(int(src * dur)) / src
        k = (f1 - f0) / dur
        chirp = lambda t: np.sin(2 * np.pi * (f0 * t + 0.5 * k * t * t))
        y = resample(jnp.asarray(chirp(t_in).astype(np.float32))[None], src, dst,
                     window=window)
        t_out = np.arange(y.shape[-1]) / dst
        ref = chirp(t_out)
        err = np.abs(np.asarray(y[0])[200:-200] - ref[200:-200]).max()
        assert err < 8e-3, err

    def test_energy_preserved_in_passband(self, rng_np):
        from scipy import signal as sps

        b, a = sps.butter(6, 3000 / 24000, btype="low")
        x = sps.lfilter(b, a, rng_np.standard_normal(48000)).astype(np.float32)
        y = np.asarray(resample(jnp.asarray(x)[None], 48000, 16000))[0]
        # energy ratio accounts for the 3x sample-count reduction
        ratio = (np.sum(y**2) * 3) / np.sum(x**2)
        assert 0.97 < ratio < 1.03, ratio


class TestTinyFanInConvVJP:
    """Stride-1 tiny-cin convs also route through the custom vjp (the disc's
    first conv, 1->16 k15); grads must match raw autodiff."""

    @pytest.mark.parametrize("cin,cout,k,s,pad,groups", [
        (1, 16, 15, 1, 7, 1),
        (4, 4, 3, 1, 1, 1),
        (8, 24, 5, 1, 2, 1),
    ])
    def test_matches_autodiff(self, cin, cout, k, s, pad, groups, rng_np, monkeypatch):
        from vibravox_tpu.ops.conv import _conv1d_raw, conv1d

        monkeypatch.setenv("VIBRAVOX_CONV_CUSTOM", "1")
        x = jnp.asarray(rng_np.standard_normal((2, 211, cin)).astype(np.float32))
        w = jnp.asarray(rng_np.standard_normal((k, cin // groups, cout)).astype(np.float32))
        ours_fn = lambda a, b: conv1d(a, b, stride=s, padding=pad, groups=groups)
        ref_fn = lambda a, b: _conv1d_raw(a, b, s, (pad, pad), 1, groups)
        np.testing.assert_allclose(
            np.asarray(ours_fn(x, w)), np.asarray(ref_fn(x, w)), atol=1e-5
        )
        g = jnp.asarray(rng_np.standard_normal(ref_fn(x, w).shape).astype(np.float32))
        for do, dr in zip(jax.vjp(ours_fn, x, w)[1](g), jax.vjp(ref_fn, x, w)[1](g)):
            np.testing.assert_allclose(np.asarray(do), np.asarray(dr), atol=2e-4)


class TestGroupedConvSPMDSafe:
    """ops/conv.py::grouped_conv1d_spmd_safe — the custom vjp must equal XLA
    autodiff on one device AND stay correct on a (data, model) mesh, where
    XLA's native grouped kernel-grad transpose is mis-reduced by GSPMD
    (dW x model-axis-size; caught by tests/test_multidevice_equivalence)."""

    def _setup(self, rng_np):
        from vibravox_tpu.ops.conv import _conv1d_raw, grouped_conv1d_spmd_safe

        b, t, c, k, g = 8, 128, 32, 16, 2
        x = jnp.asarray(rng_np.standard_normal((b, t, c)).astype(np.float32))
        w = jnp.asarray(rng_np.standard_normal((k, c // g, c)).astype(np.float32) * 0.1)
        pad = (k // 2, k // 2)
        f_safe = lambda xx, ww: jnp.sum(jnp.sin(grouped_conv1d_spmd_safe(xx, ww, pad, g)))
        f_raw = lambda xx, ww: jnp.sum(jnp.sin(_conv1d_raw(xx, ww, 1, pad, 1, g)))
        return x, w, f_safe, f_raw

    def test_vjp_matches_xla_autodiff(self, rng_np):
        x, w, f_safe, f_raw = self._setup(rng_np)
        gs = jax.grad(f_safe, argnums=(0, 1))(x, w)
        gr = jax.grad(f_raw, argnums=(0, 1))(x, w)
        for a, b in zip(gs, gr):
            # einsum-based dW vs XLA's conv-based dW: same math, different
            # f32 reduction order over B*T ~ 1e3 terms
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-4
            )

    def test_model_axis_mesh_does_not_scale_dw(self, rng_np):
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        x, w, f_safe, _ = self._setup(rng_np)

        def dw_on(shape):
            devs = jax.devices()[: shape[0] * shape[1]]
            mesh = Mesh(np.asarray(devs).reshape(shape), ("data", "model"))
            ss = NamedSharding(mesh, P())
            xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None)))
            ws = jax.device_put(w, ss)
            return np.asarray(jax.device_get(
                jax.jit(jax.grad(lambda ww, xx: f_safe(xx, ww)),
                        in_shardings=(ss, None), out_shardings=ss)(ws, xs)
            ))

        a = dw_on((1, 1))
        b = dw_on((4, 2))
        scale = np.abs(a).max()
        np.testing.assert_allclose(a, b, atol=1e-6 * max(scale, 1.0))
