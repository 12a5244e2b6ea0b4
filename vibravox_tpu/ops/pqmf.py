"""Near-perfect-reconstruction pseudo-QMF filterbank (TPU-native).

Same math as the reference (``vibravox/torch_modules/dsp/pqmf.py:17-253``):
Kaiser-windowed sinc prototype (Lin & Vaidyanathan '98) with the cutoff ratio
optimized at design time to minimize the decimated autocorrelation peak
(Eq. 5), and cosine-modulated analysis/synthesis kernels with alternating
±π/4 phase (Nguyen '94, Eq. 1).

TPU-first differences from the reference:
  * design-time cutoff optimization is a bounded scalar minimization on the
    host (scipy) instead of 5 torch-LBFGS steps — same objective, init-time
    only, result verified by the reconstruction-SNR test;
  * analysis/synthesis run as XLA ``conv_general_dilated`` in channels-last
    layout, and the band-sum of the synthesis stage is fused into a single
    dense transposed conv (the reference materializes per-band signals and
    sums — ``pqmf.py:204-213`` + call sites);
  * weights are plain frozen ``jnp`` arrays carried by closure, not module
    parameters — nothing here trains.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from vibravox_tpu.ops.conv import conv1d, conv_transpose1d

__all__ = ["PQMF", "design_pqmf_bank", "design_prototype", "optimal_cutoff_ratio"]


def design_prototype(kernel_size: int, beta: float, cutoff_ratio: float) -> np.ndarray:
    """Kaiser-windowed sinc prototype filter (float64, length ``kernel_size``)."""
    kaiser = np.kaiser(kernel_size, beta)
    n = np.arange(kernel_size) - (kernel_size - 1) / 2
    sinc = cutoff_ratio * np.sinc(cutoff_ratio * n)
    return (sinc * kaiser).astype(np.float64)


def _design_objective(cutoff: float, decimation: int, kernel_size: int, beta: float) -> float:
    """Eq. (5) of Lin & Vaidyanathan: peak of the 2M-decimated autocorrelation
    of the prototype (excluding zero lag), plus the reference's out-of-range
    penalty (``pqmf.py:103-124``)."""
    proto = design_prototype(kernel_size, beta, cutoff)
    # cross-correlation of the K//2-zero-padded prototype with itself, "valid":
    # identical to the reference's conv1d formulation; autocorr[j] is lag
    # j - K//2, j in [0, K].
    padded = np.pad(proto, kernel_size // 2)
    autocorr = np.correlate(padded, proto, mode="valid")
    autocorr[kernel_size // 2] = 0.0  # zero lag
    phi = np.max(np.abs(autocorr[:: 2 * decimation]))
    if abs(cutoff - 1 / (2 * decimation)) > 1 / (4 * decimation):
        phi += 1 / (4 * decimation)
    return float(phi)


@functools.lru_cache(maxsize=None)
def optimal_cutoff_ratio(decimation: int, kernel_size: int, beta: float) -> float:
    """Minimize the design objective over the cutoff ratio (host, init-time)."""
    from scipy.optimize import minimize_scalar

    center = 1 / (2 * decimation)
    half = 1 / (4 * decimation)
    res = minimize_scalar(
        _design_objective,
        bounds=(center - half + 1e-9, center + half - 1e-9),
        args=(decimation, kernel_size, beta),
        method="bounded",
        options={"xatol": 1e-12},
    )
    return float(res.x)


@functools.lru_cache(maxsize=None)
def design_pqmf_bank(
    decimation: int, kernel_size: int, beta: float = 9.0
) -> Tuple[np.ndarray, np.ndarray]:
    """Design the cosine-modulated bank.

    Returns:
        analysis: (decimation, kernel_size) — row i is the *time-flipped*
            modulated prototype (so a cross-correlation conv applies the true
            filter), matching ``pqmf.py:152-164``.
        synthesis: (decimation, kernel_size) — unflipped, scaled by 2M,
            matching ``pqmf.py:166-178``.
    """
    assert kernel_size % (4 * decimation) == 0, "kernel_size must be divisible by 4*decimation"
    cutoff = optimal_cutoff_ratio(decimation, kernel_size, beta)
    proto = design_prototype(kernel_size, beta, cutoff)
    n = np.arange(kernel_size) - (kernel_size - 1) / 2
    analysis = np.zeros((decimation, kernel_size))
    synthesis = np.zeros((decimation, kernel_size))
    for i in range(decimation):
        phase = (2 * i + 1) * np.pi / (2 * decimation) * n
        analysis[i] = 2 * (proto * np.cos(phase + (-1) ** i * np.pi / 4))[::-1]
        synthesis[i] = 2 * decimation * proto * np.cos(phase - (-1) ** i * np.pi / 4)
    return analysis, synthesis


class PQMF:
    """Frozen PQMF bank operating on channels-last ``(batch, time, 1)`` audio.

    API mirrors the reference class (``pqmf.py:17``): ``analysis`` /
    ``synthesis`` / ``cut_tensor``, plus shape helpers used for static-shape
    planning under jit.
    """

    def __init__(self, decimation: int = 32, kernel_size: int = 1024, beta: float = 9.0,
                 dtype: jnp.dtype = jnp.float32):
        self.decimation = decimation
        self.kernel_size = kernel_size
        self.beta = beta
        analysis, synthesis = design_pqmf_bank(decimation, kernel_size, float(beta))
        # analysis as WIO (kernel, 1, bands); conv stride M, zero-pad K-1.
        self.analysis_weights = jnp.asarray(analysis.T[:, None, :], dtype=dtype)
        # synthesis as dense torch-layout transpose-conv weight (in=M, out=1, K):
        # fuses per-band synthesis + band sum into one op.
        self.synthesis_weights = jnp.asarray(synthesis[:, None, :], dtype=dtype)

    # ------------------------------------------------------------------ #

    def analysis(self, signal: jnp.ndarray, bands: int = -1) -> jnp.ndarray:
        """PQMF analysis.  signal: (B, T, 1) -> (B, T', bands).

        T' = (T + K - 2) // M + 1, identical to the reference's
        ``conv1d(stride=M, padding=K-1)`` (``pqmf.py:196-202``).
        """
        w = self.analysis_weights if bands == -1 else self.analysis_weights[..., :bands]
        return conv1d(
            signal, w, stride=self.decimation, padding=self.kernel_size - 1
        )

    def synthesis(self, bands: jnp.ndarray, summed: bool = True) -> jnp.ndarray:
        """PQMF synthesis.  bands: (B, T', M) -> (B, T, 1) when ``summed``.

        Matches ``conv_transpose1d(stride=M, padding=K-1, output_padding=M-2,
        groups=M)`` followed by the caller-side band sum (``pqmf.py:204-213``);
        the sum is fused by running the transposed conv dense (groups=1).
        """
        if summed:
            return conv_transpose1d(
                bands,
                self.synthesis_weights,
                stride=self.decimation,
                padding=self.kernel_size - 1,
                output_padding=self.decimation - 2,
                groups=1,
            )
        return conv_transpose1d(
            bands,
            self.synthesis_weights,
            stride=self.decimation,
            padding=self.kernel_size - 1,
            output_padding=self.decimation - 2,
            groups=self.decimation,
        )

    # ------------------------------------------------------------------ #

    def valid_length(self, length: int) -> int:
        """Largest ``new_len <= length`` with ``(new_len + K) % M == 0``
        (reference ``cut_tensor``, ``pqmf.py:217-232``)."""
        return length - (length + self.kernel_size) % self.decimation

    def cut_tensor(self, signal: jnp.ndarray) -> jnp.ndarray:
        """Trim the time axis (axis 1, NWC) to a valid analysis length."""
        return signal[:, : self.valid_length(signal.shape[1]), :]

    def analysis_length(self, length: int) -> int:
        return (length + 2 * (self.kernel_size - 1) - self.kernel_size) // self.decimation + 1
