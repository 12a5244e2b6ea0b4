"""STFT and multi-resolution STFT loss (XLA-native).

Replaces the reference's delegated ``auraloss.freq.MultiResolutionSTFTLoss``
(configured at ``configs/lightning_module/loss_module/multi_stft.yaml``:
fft 512/1024/2048, hop 50/120/240, win 240/600/1200, perceptual A-weighting).

Design notes (TPU-first):
  * torch.stft-compatible framing (center=True, reflect pad, Hann window
    zero-padded to fft_size) so magnitudes match the reference loss; frames
    are extracted with a static-strided gather that XLA lowers to cheap
    slices, then batched rFFT.
  * the perceptual prefilter is a 101-tap linear-phase FIR fit (firwin2) to
    the IEC 61672 analog A-weighting response via bilinear transform —
    re-derived from the standard, applied as one fused conv per signal.
  * everything is jit-compatible and differentiable (this loss sits inside
    the generator's backprop path — ``eben.py:194-211``).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vibravox_tpu.ops.conv import conv1d

__all__ = [
    "hann_window",
    "stft_magnitude",
    "a_weighting_fir",
    "apply_fir",
    "stft_loss",
    "MultiResolutionSTFTLoss",
]


def hann_window(win_length: int, dtype=jnp.float32) -> jnp.ndarray:
    """Periodic Hann window (torch.hann_window default)."""
    n = jnp.arange(win_length, dtype=dtype)
    return 0.5 - 0.5 * jnp.cos(2.0 * jnp.pi * n / win_length)


def frame_signal(x: jnp.ndarray, frame_length: int, hop: int) -> jnp.ndarray:
    """(B, T) -> (B, n_frames, frame_length) with static start offsets."""
    n_frames = 1 + (x.shape[-1] - frame_length) // hop
    idx = (np.arange(n_frames)[:, None] * hop + np.arange(frame_length)[None, :])
    return x[..., idx]


def stft_magnitude(
    x: jnp.ndarray,
    fft_size: int,
    hop: int,
    win_length: int,
    window: jnp.ndarray | None = None,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """Magnitude STFT matching ``torch.stft(center=True, pad_mode='reflect')``.

    x: (B, T) -> (B, n_frames, fft_size // 2 + 1)

    TPU-first implementation: block-strided framing + one rDFT matmul.
    The signal is viewed as hop-sized blocks and frames are assembled from
    ``J = ceil(fft/hop)`` *shifted slices* of that view (no gather; the
    gradient is a set of slice-adds, not a scatter).  The centered window
    and the rDFT rows fold into one ``(J*hop, fft//2+1)`` matrix, so the
    whole transform is a single MXU matmul per component.
    """
    if window is not None and window.shape[0] != win_length:
        win_length = int(window.shape[0])
    try:
        key = None if window is None else tuple(np.asarray(window).tolist())
    except Exception:
        key = None  # traced window (inside jit): assume the standard Hann
    wre, wim, frame_len = _dft_matrices(fft_size, hop, win_length, key)
    wre = jnp.asarray(wre, x.dtype)
    wim = jnp.asarray(wim, x.dtype)

    lead = x.shape[:-1]
    t_in = x.shape[-1]
    x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(fft_size // 2, fft_size // 2)], mode="reflect")
    n_frames = 1 + t_in // hop  # torch.stft frame count with center=True
    j_blocks = frame_len // hop
    total = (n_frames - 1 + j_blocks) * hop
    x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, max(0, total - x.shape[-1]))])
    xb = x[..., :total].reshape(lead + (n_frames - 1 + j_blocks, hop))
    frames = jnp.concatenate(
        [xb[..., j : j + n_frames, :] for j in range(j_blocks)], axis=-1
    )  # (..., n_frames, frame_len)
    re = jnp.einsum("...tf,fk->...tk", frames, wre, preferred_element_type=jnp.float32)
    im = jnp.einsum("...tf,fk->...tk", frames, wim, preferred_element_type=jnp.float32)
    power = re**2 + im**2
    return jnp.sqrt(jnp.clip(power, min=eps))


@functools.lru_cache(maxsize=None)
def _dft_matrices(fft_size: int, hop: int, win_length: int, window_values=None):
    """Real/imag rDFT matrices (frame_len, fft//2+1) with the torch-style
    centered window folded in; frame_len = ceil(fft/hop)*hop ≥ fft, and the
    tail rows are zero (the frame extends past the fft window)."""
    if window_values is None:
        n = np.arange(win_length)
        win = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)
    else:
        win = np.asarray(window_values, dtype=np.float64)
    pad_l = (fft_size - win_length) // 2
    win_padded = np.zeros(fft_size)
    win_padded[pad_l : pad_l + win_length] = win
    t = np.arange(fft_size)[:, None]
    k = np.arange(fft_size // 2 + 1)[None, :]
    angle = -2.0 * np.pi * t * k / fft_size
    frame_len = -(-fft_size // hop) * hop
    wre = np.zeros((frame_len, fft_size // 2 + 1), np.float32)
    wim = np.zeros((frame_len, fft_size // 2 + 1), np.float32)
    wre[:fft_size] = np.cos(angle) * win_padded[:, None]
    wim[:fft_size] = np.sin(angle) * win_padded[:, None]
    return wre, wim, frame_len


# --------------------------------------------------------------------------- #
# A-weighting perceptual prefilter
# --------------------------------------------------------------------------- #


@functools.lru_cache(maxsize=None)
def a_weighting_fir(sample_rate: int, ntaps: int = 101) -> np.ndarray:
    """Linear-phase FIR approximation of IEC 61672 A-weighting.

    Analog transfer function poles at f1..f4 with +2.0 dB gain normalisation
    at 1 kHz, discretised by bilinear transform, then fit with ``firwin2``.
    """
    from scipy import signal as sps

    f1, f2, f3, f4 = 20.598997, 107.65265, 737.86223, 12194.217
    a1000 = 1.9997
    num = [(2 * np.pi * f4) ** 2 * 10 ** (a1000 / 20), 0, 0, 0, 0]
    den = np.polymul(
        [1, 4 * np.pi * f4, (2 * np.pi * f4) ** 2],
        [1, 4 * np.pi * f1, (2 * np.pi * f1) ** 2],
    )
    den = np.polymul(np.polymul(den, [1, 2 * np.pi * f3]), [1, 2 * np.pi * f2])
    b, a = sps.bilinear(num, den, fs=sample_rate)
    # least-squares FIR fit on the 512-point freqz grid — the exact recipe of
    # the auraloss FIRFilter("aw") prefilter the reference loss is built on
    w, h = sps.freqz(b, a, worN=512, fs=sample_rate)
    taps = sps.firls(ntaps, w, np.abs(h), fs=sample_rate)
    return taps.astype(np.float32)


_FIR_PACK = 8


def _fir_conv(x: jnp.ndarray, w: jnp.ndarray, pad_left: int, pad_right: int) -> jnp.ndarray:
    """(B, T) zero-padded FIR.  Space-to-depth packed when T divides: the
    k101 A-weighting FIR at (B, ~40k) fills ONE of the 128 vector lanes and
    was ~1 ms per application in the batch-32 GAN-step profile; packing p=8
    densifies 8 samples into the lane axis (rows ÷8 for +19% taps) and is
    exact — the packed zero rows are a superset of the true zero pad."""
    b, t = x.shape
    if t % _FIR_PACK == 0:
        from vibravox_tpu.ops.packed_seanet import pack_causal_kernel

        kp, pads = pack_causal_kernel(
            w, stride=1, pad_left=pad_left, p_in=_FIR_PACK, p_out=_FIR_PACK)
        y = conv1d(x.reshape(b, t // _FIR_PACK, _FIR_PACK), kp, padding=pads)
        return y.reshape(b, t)
    return conv1d(x[:, :, None], w, padding=(pad_left, pad_right))[:, :, 0]


@jax.custom_vjp
def _fir_same(x: jnp.ndarray, taps: jnp.ndarray) -> jnp.ndarray:
    k = taps.shape[0]
    w = taps[::-1][:, None, None]  # (k, 1, 1): true convolution
    return _fir_conv(x, w, k // 2, (k - 1) // 2)


def _fir_same_fwd(x, taps):
    return _fir_same(x, taps), (x, taps)


def _fir_same_bwd(res, g):
    # Hand-written backward expressed as *forward* convs.  XLA's autodiff
    # emits an lhs-dilated gradient conv for this op, which on this backend
    # hits a flat ~29 ms layout pathology for (B, 40k) single-channel audio
    # (round-1 ablation); a plain stride-1 correlation is ~100x faster.
    x, taps = res
    k = taps.shape[0]
    pl, pr = k // 2, (k - 1) // 2
    # dx[s] = sum_i taps[i] * g[s + pl - k + 1 + i]: correlation with the
    # UN-flipped taps, padding (k-1-pl, k-1-pr)
    dx = _fir_conv(g, taps[:, None, None], k - 1 - pl, k - 1 - pr)
    # dtaps[i] = sum_{b,t} g[b,t] * xpad[b, t + k - 1 - i]: one valid-padded
    # correlation with batch folded into the channel dim
    xpad = jnp.pad(x, [(0, 0), (pl, pr)])
    lhs = jnp.transpose(xpad, (1, 0))[None]  # (1, T+k-1, B)
    rhs = jnp.transpose(g, (1, 0))[:, :, None]  # (T, B, 1)
    out = conv1d(lhs, rhs, padding=0)[0, :, 0]  # (k,)
    dtaps = out[::-1].astype(taps.dtype)
    return dx.astype(x.dtype), dtaps


_fir_same.defvjp(_fir_same_fwd, _fir_same_bwd)


def apply_fir(x: jnp.ndarray, taps: jnp.ndarray) -> jnp.ndarray:
    """Filter (B, T) with a linear-phase FIR, 'same' output length.

    Custom-vjp: the gradient w.r.t. the signal is emitted as another
    stride-1 forward correlation instead of XLA's transposed/dilated
    gradient conv (pathologically slow on this TPU backend).
    """
    return _fir_same(x, taps)


# --------------------------------------------------------------------------- #
# Losses
# --------------------------------------------------------------------------- #


def spectral_convergence(x_mag: jnp.ndarray, y_mag: jnp.ndarray) -> jnp.ndarray:
    """|| |Y|-|X| ||_F / || |Y| ||_F over the FULL tensor (auraloss
    ``SpectralConvergenceLoss`` semantics — a single global Frobenius ratio,
    not a per-sample mean)."""
    num = jnp.sqrt(jnp.sum((y_mag - x_mag) ** 2))
    den = jnp.sqrt(jnp.sum(y_mag**2))
    return num / den


def log_magnitude_l1(x_mag: jnp.ndarray, y_mag: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(jnp.log(x_mag) - jnp.log(y_mag)))


def stft_loss(
    x: jnp.ndarray,
    y: jnp.ndarray,
    fft_size: int,
    hop: int,
    win_length: int,
    window: jnp.ndarray,
    w_sc: float = 1.0,
    w_log_mag: float = 1.0,
) -> jnp.ndarray:
    x_mag = stft_magnitude(x, fft_size, hop, win_length, window)
    y_mag = stft_magnitude(y, fft_size, hop, win_length, window)
    return w_sc * spectral_convergence(x_mag, y_mag) + w_log_mag * log_magnitude_l1(x_mag, y_mag)


class MultiResolutionSTFTLoss:
    """Multi-resolution STFT loss with optional perceptual (A-)weighting.

    Drop-in functional replacement for the auraloss module the reference
    configures; callable on channels-last audio ``(B, T, 1)`` or ``(B, T)``.
    """

    def __init__(
        self,
        fft_sizes: Sequence[int] = (1024, 2048, 512),
        hop_sizes: Sequence[int] = (120, 240, 50),
        win_lengths: Sequence[int] = (600, 1200, 240),
        sample_rate: int | None = None,
        perceptual_weighting: bool = False,
        w_sc: float = 1.0,
        w_log_mag: float = 1.0,
        use_pallas: bool | None = None,
        upcast_to_f32: bool = True,
    ):
        assert len(fft_sizes) == len(hop_sizes) == len(win_lengths)
        if use_pallas is None:
            import os

            # opt-in (measured round 2: the XLA path's framing + custom-vjp
            # FIR gradient already runs at ~6.7 ms/step for the full 3-res
            # loss; the Pallas fwd+bwd kernels are kept as an alternative)
            use_pallas = os.environ.get("VIBRAVOX_PALLAS", "0") == "1"
        self.use_pallas = bool(use_pallas)
        # reductions/magnitudes always accumulate in f32; with
        # upcast_to_f32=False the DFT matmuls run in the *input* dtype
        # (bf16 on TPU — several x faster, ~1e-2 relative loss noise)
        self.upcast_to_f32 = bool(upcast_to_f32)
        self.resolutions: Tuple[Tuple[int, int, int], ...] = tuple(
            zip(map(int, fft_sizes), map(int, hop_sizes), map(int, win_lengths))
        )
        self.windows = [hann_window(w) for _, _, w in self.resolutions]
        self.w_sc = float(w_sc)
        self.w_log_mag = float(w_log_mag)
        self.perceptual_weighting = bool(perceptual_weighting)
        if self.perceptual_weighting:
            if sample_rate is None:
                raise ValueError("sample_rate required for perceptual weighting")
            self.prefilter_taps = jnp.asarray(a_weighting_fir(int(sample_rate)))

    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        if self.upcast_to_f32:
            x = x.astype(jnp.float32)
            y = y.astype(jnp.float32)
        if x.ndim == 3:  # (B, T, C) -> fold channels into batch
            x = x.reshape(-1, x.shape[1]) if x.shape[2] == 1 else jnp.moveaxis(x, 2, 1).reshape(-1, x.shape[1])
            y = y.reshape(-1, y.shape[1]) if y.shape[2] == 1 else jnp.moveaxis(y, 2, 1).reshape(-1, y.shape[1])
        if self.perceptual_weighting:
            x = apply_fir(x, self.prefilter_taps)
            y = apply_fir(y, self.prefilter_taps)
        loss = 0.0
        if self.use_pallas:
            from vibravox_tpu.ops.pallas_stft import framed_dft_magnitude

            for fft, hop, win in self.resolutions:
                x_mag = framed_dft_magnitude(x, fft, hop, win)
                y_mag = framed_dft_magnitude(y, fft, hop, win)
                loss = loss + (
                    self.w_sc * spectral_convergence(x_mag, y_mag)
                    + self.w_log_mag * log_magnitude_l1(x_mag, y_mag)
                )
            return loss / len(self.resolutions)
        for (fft, hop, win), window in zip(self.resolutions, self.windows):
            loss = loss + stft_loss(x, y, fft, hop, win, window, self.w_sc, self.w_log_mag)
        return loss / len(self.resolutions)
