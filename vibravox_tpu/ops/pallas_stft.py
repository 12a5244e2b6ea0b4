"""Pallas TPU kernels: fused framed-rDFT magnitude, forward AND backward.

The XLA path of :func:`vibravox_tpu.ops.stft.stft_magnitude` materializes
the assembled frames ``(B, n_frames, frame_len)`` in HBM before the DFT
matmuls — for the 2048-point resolution that is a ~9× blow-up of the input
written and read back.  Worse, on this backend any *gradient* program over
long ``(B, 40k)`` audio with narrow-minor-dim intermediates pays a flat
~30 ms layout/relayout penalty (round-1 ablation, CLAUDE.md).  These
kernels keep framing + window·DFT + |·| (and the whole backward) in VMEM:

forward — grid (bins, batch, frame-blocks); per block:
      DMA xb[b, i·TF : i·TF+TF+J-1] -> VMEM scratch   (halo rows overlap)
      frames (TF, J·hop) = J shifted slices of the scratch
      re/im = frames @ Wre/Wim block                   (MXU, f32 accumulate)
      out   = sqrt(clip(re² + im², eps))
    The bin axis is OUTERMOST so the W blocks — by far the largest operands
    — are DMA'd once per bin block instead of once per grid cell.

backward — grid (batch, row-blocks, bins); per block, given the upstream
    cotangent pre-divided by the magnitudes (gom = g/|X|, zero where the
    power clamp was active):
      re/im recomputed exactly as in the forward (halo'd x rows)
      gre/gim = gom · re / gom · im
      dframes = gre @ Wreᵀ + gim @ Wimᵀ                (MXU, contract bins)
      dxb rows = Σ_j dframes[shifted rows, j-th hop slice]   (overlap-add)
    The bin axis is INNERMOST and the output block is revisited across it,
    accumulating the per-bin-block contributions in VMEM.

``framed_dft_magnitude`` wires both into a ``jax.custom_vjp``; reflect-pad
and framing pre/post-processing (and their hand-written transposes) are
plain slices/pads at the XLA level.  Used by ``MultiResolutionSTFTLoss``
when ``VIBRAVOX_PALLAS=1`` (opt-in: measured ~15-20% behind the XLA path
at the training shapes on the round-2 backend — the XLA framing+rDFT with
the custom-vjp FIR is already ~6.7 ms for the full 3-resolution gradient);
correctness is pinned to the XLA path by tests (forward and gradient).
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

_TF = 256   # frames per block (forward)
_TR = 256   # x rows per block (backward)
_KB = 256   # bins per block


def _interpret() -> bool:
    return jax.devices()[0].platform == "cpu"


@functools.lru_cache(maxsize=None)
def _padded_w(fft_size: int, hop: int, win_length: int, hop_padded: int, kb_total: int):
    """Per-shift rDFT matrices spread onto the lane-aligned (J*hp, kb) grid."""
    wre_np, wim_np, frame_len = _dft_matrices(fft_size, hop, win_length, None)
    j_blocks = frame_len // hop
    n_bins = fft_size // 2 + 1
    wre = np.zeros((j_blocks * hop_padded, kb_total), np.float32)
    wim = np.zeros((j_blocks * hop_padded, kb_total), np.float32)
    for j in range(j_blocks):
        wre[j * hop_padded : j * hop_padded + hop, :n_bins] = wre_np[j * hop : (j + 1) * hop]
        wim[j * hop_padded : j * hop_padded + hop, :n_bins] = wim_np[j * hop : (j + 1) * hop]
    return wre, wim, j_blocks


def _geometry(fft_size: int, hop: int, t_in: int):
    n_frames = 1 + t_in // hop  # torch.stft frame count with center=True
    frame_len = -(-fft_size // hop) * hop
    j_blocks = frame_len // hop
    n_bins = fft_size // 2 + 1
    fblocks = pl.cdiv(n_frames, _TF)
    kblocks = pl.cdiv(n_bins, _KB)
    nb_needed = fblocks * _TF + j_blocks - 1
    hop_padded = -(-hop // 128) * 128
    return n_frames, j_blocks, n_bins, fblocks, kblocks, nb_needed, hop_padded


def _blocked_input(x, fft_size: int, hop: int, nb_needed: int, hop_padded: int):
    """(B, T) -> reflect-padded hop-blocked (B, nb_needed, hop_padded)."""
    x = jnp.pad(x, [(0, 0), (fft_size // 2, fft_size // 2)], mode="reflect")
    total = nb_needed * hop
    x = jnp.pad(x, [(0, 0), (0, max(0, total - x.shape[-1]))])
    xb = x[:, :total].reshape(x.shape[0], nb_needed, hop)
    return jnp.pad(xb, [(0, 0), (0, 0), (0, hop_padded - hop)])


# --------------------------------------------------------------------------- #
# forward
# --------------------------------------------------------------------------- #


def _fwd_kernel(xb_hbm, wre_ref, wim_ref, out_ref, *, j_blocks: int, eps: float, tf: int):
    b = pl.program_id(1)
    i = pl.program_id(2)

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
    batch, t_in = x.shape[0], x.shape[-1]
    n_frames, j_blocks, n_bins, fblocks, kblocks, nb_needed, hop_padded = _geometry(
        fft_size, hop, t_in
    )
    xb = _blocked_input(x, fft_size, hop, nb_needed, hop_padded)
    kb_total = kblocks * _KB
    wre_np, wim_np, _ = _padded_w(fft_size, hop, win_length, hop_padded, kb_total)
    wre = jnp.asarray(wre_np, x.dtype)
    wim = jnp.asarray(wim_np, x.dtype)

    # bins OUTERMOST: the W blocks (the big operands) are fetched once per
    # bin block, not once per (b, i, k) grid cell
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, j_blocks=j_blocks, eps=eps, tf=_TF),
        out_shape=jax.ShapeDtypeStruct((batch, fblocks * _TF, kb_total), jnp.float32),
        grid=(kblocks, batch, fblocks),
        interpret=_interpret(),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # xb stays in HBM, DMA'd manually
            pl.BlockSpec((j_blocks * hop_padded, _KB), lambda k, b, i: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((j_blocks * hop_padded, _KB), lambda k, b, i: (0, k), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _TF, _KB), lambda k, b, i: (b, i, k), memory_space=pltpu.VMEM),
    )(xb, wre, wim)
    return out[:, :n_frames, :n_bins]


# --------------------------------------------------------------------------- #
# backward
# --------------------------------------------------------------------------- #


def _bwd_rows(tr: int, j_blocks: int):
    """Sublane-aligned (8) DMA row counts for the backward kernel — Mosaic
    rejects unaligned slice shapes; the extra rows read XLA-side zero pad."""
    f_rows = -(-(tr + j_blocks - 1) // 8) * 8          # frames touching a block
    x_rows = -(-(j_blocks - 1 + f_rows) // 8) * 8      # x rows those frames span
    return f_rows, x_rows


def _bwd_kernel(xtop_hbm, gom_hbm, wre_ref, wim_ref, out_ref, *,
                j_blocks: int, tr: int, kb: int):
    b = pl.program_id(0)
    i = pl.program_id(1)
    k = pl.program_id(2)

    def body(xs, gs, xsem, gsem):
        f_rows, x_rows = _bwd_rows(tr, j_blocks)
        xdma = pltpu.make_async_copy(
            xtop_hbm.at[b, pl.ds(i * tr, x_rows), :], xs, xsem
        )
        gdma = pltpu.make_async_copy(
            gom_hbm.at[b, pl.ds(i * tr, f_rows), pl.ds(k * kb, kb)], gs, gsem
        )
        xdma.start()
        gdma.start()
        xdma.wait()
        xv = xs[:]
        hp = xv.shape[-1]
        # recompute re/im for the F = TR+J-1 frames whose taps touch this
        # row block (top-padded geometry: local frame f covers xv[f : f+J])
        re = jnp.zeros((f_rows, kb), jnp.float32)
        im = jnp.zeros((f_rows, kb), jnp.float32)
        for j in range(j_blocks):
            xsl = xv[j : j + f_rows]
            re = re + jnp.dot(xsl, wre_ref[j * hp : (j + 1) * hp, :],
                              preferred_element_type=jnp.float32)
            im = im + jnp.dot(xsl, wim_ref[j * hp : (j + 1) * hp, :],
                              preferred_element_type=jnp.float32)
        gdma.wait()
        gom = gs[:]  # (F, KB) — upstream cotangent / |X|, 0 where clamped
        gre = gom * re
        gim = gom * im
        # dframes = gre @ Wreᵀ + gim @ Wimᵀ : contract the bin axis of both
        nt = (((1,), (1,)), ((), ()))
        df = jax.lax.dot_general(gre, wre_ref[:], nt, preferred_element_type=jnp.float32)
        df = df + jax.lax.dot_general(gim, wim_ref[:], nt, preferred_element_type=jnp.float32)
        # overlap-add: dx row r gets dframes[r + J-1-j, j-th hop slice]
        acc = df[j_blocks - 1 : j_blocks - 1 + tr, 0:hp]
        for j in range(1, j_blocks):
            acc = acc + df[j_blocks - 1 - j : j_blocks - 1 - j + tr, j * hp : (j + 1) * hp]

        @pl.when(k == 0)
        def _():
            out_ref[0] = acc

        @pl.when(k > 0)
        def _():
            out_ref[0] = out_ref[0] + acc

    f_rows, x_rows = _bwd_rows(tr, j_blocks)
    pl.run_scoped(
        body,
        xs=pltpu.VMEM((x_rows, xtop_hbm.shape[-1]), xtop_hbm.dtype),
        gs=pltpu.VMEM((f_rows, kb), gom_hbm.dtype),
        xsem=pltpu.SemaphoreType.DMA,
        gsem=pltpu.SemaphoreType.DMA,
    )


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def _pallas_backward(x, gom, fft_size: int, hop: int, win_length: int, eps: float):
    """d loss / d x given gom = cotangent(|X|) / |X| (already zero-masked)."""
    batch, t_in = x.shape[0], x.shape[-1]
    n_frames, j_blocks, n_bins, fblocks, kblocks, nb_needed, hop_padded = _geometry(
        fft_size, hop, t_in
    )
    kb_total = kblocks * _KB
    rblocks = pl.cdiv(nb_needed, _TR)
    r_total = rblocks * _TR

    xb = _blocked_input(x, fft_size, hop, nb_needed, hop_padded)
    # top-pad J-1 zero rows so every block's halo reads are in-bounds; pad the
    # bottom far enough for the last block's (8-aligned) DMA reads
    f_rows, x_rows = _bwd_rows(_TR, j_blocks)
    xtop_rows = (rblocks - 1) * _TR + x_rows
    gom_rows = (rblocks - 1) * _TR + f_rows
    xtop = jnp.pad(
        xb, [(0, 0), (j_blocks - 1, xtop_rows - (j_blocks - 1) - nb_needed), (0, 0)]
    )
    gom_p = jnp.pad(
        gom.astype(jnp.float32),
        [(0, 0), (j_blocks - 1, gom_rows - (j_blocks - 1) - n_frames), (0, kb_total - n_bins)],
    )

    wre_np, wim_np, _ = _padded_w(fft_size, hop, win_length, hop_padded, kb_total)
    wre = jnp.asarray(wre_np, x.dtype)
    wim = jnp.asarray(wim_np, x.dtype)

    dxb = pl.pallas_call(
        functools.partial(_bwd_kernel, j_blocks=j_blocks, tr=_TR, kb=_KB),
        out_shape=jax.ShapeDtypeStruct((batch, r_total, hop_padded), jnp.float32),
        grid=(batch, rblocks, kblocks),
        interpret=_interpret(),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # xtop, DMA'd manually
            pl.BlockSpec(memory_space=pl.ANY),  # gom,  DMA'd manually
            pl.BlockSpec((j_blocks * hop_padded, _KB), lambda b, i, k: (0, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((j_blocks * hop_padded, _KB), lambda b, i, k: (0, k), memory_space=pltpu.VMEM),
        ],
        # bins innermost: the output row block stays resident in VMEM and
        # accumulates the per-bin-block contributions
        out_specs=pl.BlockSpec((1, _TR, hop_padded), lambda b, i, k: (b, i, 0), memory_space=pltpu.VMEM),
    )(xtop, gom_p, wre, wim)

    # undo the framing: (B, R, hp) -> rows/lanes of interest -> flat signal
    total = nb_needed * hop
    dxp = dxb[:, :nb_needed, :hop].reshape(batch, total)
    pad = fft_size // 2
    dxp = dxp[:, : t_in + 2 * pad]
    # transpose of the reflect pad: fold the edge gradients back inside
    dx = dxp[:, pad : pad + t_in]
    dx = dx.at[:, 1 : pad + 1].add(dxp[:, :pad][:, ::-1])
    dx = dx.at[:, t_in - pad - 1 : t_in - 1].add(dxp[:, pad + t_in :][:, ::-1])
    return dx.astype(x.dtype)


# --------------------------------------------------------------------------- #
# custom-vjp wiring
# --------------------------------------------------------------------------- #


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def framed_dft_magnitude(x, fft_size: int, hop: int, win_length: int, eps: float = 1e-8):
    """|STFT| via the fused Pallas kernels (forward and backward)."""
    return _pallas_forward(x, fft_size, hop, win_length, eps)


def _fwd(x, fft_size, hop, win_length, eps):
    mag = _pallas_forward(x, fft_size, hop, win_length, eps)
    return mag, (x, mag)


def _bwd(fft_size, hop, win_length, eps, res, g):
    x, mag = res
    # d|X|/d re = re/|X| (0 where the power clamp was active): pre-divide the
    # cotangent once so the kernel only multiplies by its recomputed re/im
    gom = jnp.where(mag > np.sqrt(eps), g / mag, 0.0)
    return (_pallas_backward(x, gom, fft_size, hop, win_length, eps),)


framed_dft_magnitude.defvjp(_fwd, _bwd)
