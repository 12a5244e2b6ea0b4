"""Pallas TPU kernel: fused framed-rDFT magnitude.

The XLA path of :func:`vibravox_tpu.ops.stft.stft_magnitude` materializes
the assembled frames ``(B, n_frames, frame_len)`` in HBM before the DFT
matmuls — for the 2048-point resolution that is a ~9× blow-up of the input
written and read back.  This kernel DMAs each frame block's hop-strided
rows (with halo) from HBM into VMEM, assembles the frames there, runs both
rDFT matmuls on the MXU, and writes only the magnitudes — framing +
window·DFT + |·| fused into one pass:

    grid (batch, frame-blocks, bin-blocks); per block:
      DMA xb[b, i·TF : i·TF+TF+J-1] -> VMEM scratch   (halo rows overlap)
      frames (TF, J·hop) = J shifted slices of the scratch
      re/im = frames @ Wre/Wim block                   (MXU, f32 accumulate)
      out   = sqrt(clip(re² + im², eps))

Used by the multi-res STFT loss forward via ``custom_vjp`` (the backward
recomputes through the XLA path, whose gradient is slice-adds + matmuls).
Opt-in through ``MultiResolutionSTFTLoss(use_pallas=True)`` or the
``VIBRAVOX_PALLAS=1`` env var; correctness is pinned to the XLA path by
tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vibravox_tpu.ops.stft import _dft_matrices

__all__ = ["framed_dft_magnitude"]

_TF = 256   # frames per block
_KB = 256   # bins per block


def _kernel(xb_hbm, wre_ref, wim_ref, out_ref, *, j_blocks: int, eps: float, tf: int):
    b = pl.program_id(0)
    i = pl.program_id(1)

    def body(scratch, sem):
        rows = tf + j_blocks - 1
        dma = pltpu.make_async_copy(
            xb_hbm.at[b, pl.ds(i * tf, rows), :], scratch, sem
        )
        dma.start()
        dma.wait()
        xv = scratch[:]  # (TF + J - 1, hop_padded)
        hp = xv.shape[-1]  # lane-aligned hop (multiple of 128)
        # frame assembly by accumulation: frame block = Σ_j shift_j(x) @ W_j —
        # avoids lane-misaligned concatenates that Mosaic cannot lower; the
        # hop padding rows of W are zero so they contribute nothing
        re = jnp.zeros(out_ref.shape[1:], jnp.float32)
        im = jnp.zeros(out_ref.shape[1:], jnp.float32)
        for j in range(j_blocks):
            xs = xv[j : j + tf]
            re = re + jnp.dot(xs, wre_ref[j * hp : (j + 1) * hp, :],
                              preferred_element_type=jnp.float32)
            im = im + jnp.dot(xs, wim_ref[j * hp : (j + 1) * hp, :],
                              preferred_element_type=jnp.float32)
        # clamp POWER at eps before the sqrt — the torch.stft/auraloss
        # convention the XLA path (ops/stft.py stft_magnitude) follows
        out_ref[0] = jnp.sqrt(jnp.clip(re * re + im * im, min=eps))

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((tf + j_blocks - 1, xb_hbm.shape[-1]), xb_hbm.dtype),
        sem=pltpu.SemaphoreType.DMA,
    )


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _pallas_forward(x: jnp.ndarray, fft_size: int, hop: int, win_length: int, eps: float):
    wre_np, wim_np, frame_len = _dft_matrices(fft_size, hop, win_length, None)
    j_blocks = frame_len // hop
    n_bins = fft_size // 2 + 1

    batch = x.shape[0]
    t_in = x.shape[-1]
    x = jnp.pad(x, [(0, 0), (fft_size // 2, fft_size // 2)], mode="reflect")
    n_frames = 1 + t_in // hop
    fblocks = pl.cdiv(n_frames, _TF)
    kblocks = pl.cdiv(n_bins, _KB)
    nb_needed = fblocks * _TF + j_blocks - 1
    total = nb_needed * hop
    x = jnp.pad(x, [(0, 0), (0, max(0, total - x.shape[-1]))])
    # lane-align the hop dim (DMA slices need a 128-multiple minor dim);
    # the extra columns are zero and the matching W rows are zero too
    hop_padded = -(-hop // 128) * 128
    xb = x[:, :total].reshape(batch, nb_needed, hop)
    xb = jnp.pad(xb, [(0, 0), (0, 0), (0, hop_padded - hop)])

    # pad bins to a block multiple so every grid cell is full, and spread the
    # per-shift W rows onto the hop_padded grid
    kb_total = kblocks * _KB
    wre = np.zeros((j_blocks * hop_padded, kb_total), np.float32)
    wim = np.zeros((j_blocks * hop_padded, kb_total), np.float32)
    for j in range(j_blocks):
        wre[j * hop_padded : j * hop_padded + hop, :n_bins] = wre_np[j * hop : (j + 1) * hop]
        wim[j * hop_padded : j * hop_padded + hop, :n_bins] = wim_np[j * hop : (j + 1) * hop]
    wre = jnp.asarray(wre, x.dtype)
    wim = jnp.asarray(wim, x.dtype)

    out = pl.pallas_call(
        functools.partial(_kernel, j_blocks=j_blocks, eps=eps, tf=_TF),
        out_shape=jax.ShapeDtypeStruct((batch, fblocks * _TF, kb_total), jnp.float32),
        grid=(batch, fblocks, kblocks),
        interpret=jax.devices()[0].platform == "cpu",
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # xb stays in HBM, DMA'd manually
            pl.BlockSpec((j_blocks * hop_padded, _KB), lambda b, i, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((j_blocks * hop_padded, _KB), lambda b, i, k: (0, k), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _TF, _KB), lambda b, i, k: (b, i, k), memory_space=pltpu.VMEM),
    )(xb, wre, wim)
    return out[:, :n_frames, :n_bins]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def framed_dft_magnitude(x, fft_size: int, hop: int, win_length: int, eps: float = 1e-8):
    """|STFT| via the fused Pallas kernel; XLA-path gradient under vjp."""
    return _pallas_forward(x, fft_size, hop, win_length, eps)


def _fwd(x, fft_size, hop, win_length, eps):
    return _pallas_forward(x, fft_size, hop, win_length, eps), x


def _bwd(fft_size, hop, win_length, eps, x, g):
    from vibravox_tpu.ops.stft import stft_magnitude

    _, vjp = jax.vjp(lambda xx: stft_magnitude(xx, fft_size, hop, win_length, eps=eps), x)
    return vjp(g)


framed_dft_magnitude.defvjp(_fwd, _bwd)
