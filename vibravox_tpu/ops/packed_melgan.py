"""Space-to-depth packed MelGAN discriminator stem (pure XLA).

The batch-32 EBEN GAN step profile (``scripts/profile_full_step.py``, after
the generator's packed residual stacks landed) attributes its largest
device ops to the full-rate MelGAN discriminator's first grouped convs and
their gradients: ``conv_1`` (16→64, k41, s4, g4) and ``conv_2`` (64→256,
k41, s4, g4) appear as ``(B, 39904, 4, 4)`` / ``(B, 9976, 4, 16)``-shaped
ops filling 16-64 of the 128 vector lanes, with the lhs-dilated backward of
``conv_1`` alone costing several ms (ref module:
``/root/reference/vibravox/torch_modules/dnn/melgan_discriminator.py:76-169``).

This module packs ``p = 8`` waveform samples into the channel axis and runs
the stem dense:

* ``conv_0`` (1→16, k15, reflect(7,7)) packs 8→8; the reflect pad breaks
  packed exactness only in the first/last 7 outputs — exactly one packed
  row per side is re-computed by the plain path on a short window and
  stitched in (same scheme as ``ops/packed_residual.py``);
* ``conv_1`` packs 8→2 (stride 4).  Its torch-style symmetric ZERO padding
  makes the packed form exact: the packed zero rows are a superset of the
  true pad and the extra zeros contribute nothing;
* a free reshape repacks ``conv_1``'s (B, T/8, 128) output at p=4 over the
  64 channels, and ``conv_2`` packs 4→1, emitting the natural dense
  ``(B, T/16, 256)`` layout — the packed domain ends where the channel
  count reaches 256.

Grouped kernels are first scattered into block-diagonal DENSE kernels
(linear in the weights, so cotangents project back automatically) — that
group-densification is precisely the lane fill the packing buys.

Values and the full vjp are pinned against the plain path in
``tests/test_packed_melgan.py``.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import jax.numpy as jnp

from vibravox_tpu.ops.conv import conv1d, reflect_pad
from vibravox_tpu.ops.packed_seanet import KernelBias, _pconv

__all__ = ["disc_stem_packable", "dense_from_grouped", "packed_disc_stem"]

_P = 8          # waveform pack factor
_EDGE_W = 64    # plain-path edge window for the conv_0 reflect stitch


def _leaky(x: jnp.ndarray, slope: float) -> jnp.ndarray:
    return jnp.where(x >= 0, x, slope * x)


def disc_stem_packable(t: int, batch: Optional[int] = None) -> bool:
    """Admissibility: time axis divides the pack factor and is long enough
    for the edge windows.  EBEN's valid lengths (multiples of 256) always
    qualify."""
    return (
        os.environ.get("VIBRAVOX_PACKED_DISC", "1") == "1"
        and t % _P == 0
        and t >= 4 * _EDGE_W
    )


def dense_from_grouped(w: jnp.ndarray, groups: int) -> jnp.ndarray:
    """Scatter a grouped WIO kernel ``(K, cin/g, cout)`` into the equivalent
    block-diagonal dense kernel ``(K, cin, cout)`` (zero cross-group
    blocks).  Linear, so autodiff projects dense-kernel cotangents back onto
    the grouped parameterization."""
    if groups == 1:
        return w
    k, cg, cout = w.shape
    og = cout // groups
    dense = jnp.zeros((k, cg * groups, cout), w.dtype)
    for g in range(groups):
        dense = dense.at[
            :, g * cg : (g + 1) * cg, g * og : (g + 1) * og
        ].set(w[:, :, g * og : (g + 1) * og])
    return dense


def packed_disc_stem(
    audio: jnp.ndarray,
    conv0: KernelBias,
    conv1: KernelBias,
    conv2: Optional[KernelBias],
    *,
    groups: int = 4,
    slope: float = 0.2,
) -> List[jnp.ndarray]:
    """MelGAN stem in the packed domain.

    ``audio`` (B, T, 1) → the stem's per-layer embeddings, unpacked:
    ``[e0 (B,T,16), e1 (B,T/4,64)[, e2 (B,T/16,256)]]`` — each the exact
    (up to float reassociation) post-leaky activation the plain path
    produces.  ``conv2`` runs packed only when ``T/8`` is even (the p=4
    repack needs row pairs); pass ``None`` to skip it.
    """
    b, t, _ = audio.shape
    dt = audio.dtype
    w0, b0 = conv0
    c0_feats = w0.shape[-1]
    k0 = w0.shape[0]
    pad0 = (k0 - 1) // 2

    z = audio.reshape(b, t // _P, _P)
    h = _pconv(z, conv0, stride=1, pad_left=pad0, p_in=_P, p_out=_P)

    # reflect-pad stitch: the first/last pad0 (< _P) outputs read reflected
    # samples the packed zero pad doesn't provide — recompute exactly one
    # packed row per side with the true reflect padding on a short window
    def _plain0(win: jnp.ndarray) -> jnp.ndarray:
        y = conv1d(reflect_pad(win, (pad0, pad0)), w0.astype(dt), padding=0)
        if b0 is not None:
            y = y + b0.astype(y.dtype)
        return y

    left = _plain0(audio[:, :_EDGE_W])[:, :_P]
    right = _plain0(audio[:, -_EDGE_W:])[:, -_P:]
    h = h.at[:, :1].set(left.reshape(b, 1, _P * c0_feats))
    h = h.at[:, -1:].set(right.reshape(b, 1, _P * c0_feats))
    h = _leaky(h, slope)
    out = [h.reshape(b, t, c0_feats)]

    # conv_1: k41 s4 g4, symmetric zero pad (k-1)//2 — exact in the packed
    # domain (the packed zero rows are a superset of the true pad)
    w1, b1 = conv1
    k1 = w1.shape[0]
    h = _pconv(h, (dense_from_grouped(w1, groups), b1),
               stride=4, pad_left=(k1 - 1) // 2, p_in=_P, p_out=_P // 4)
    h = _leaky(h, slope)
    c1_feats = w1.shape[-1]
    out.append(h.reshape(b, t // 4, c1_feats))

    # depth knob, measured on the v5e at the batch-32 GAN recipe: depth 2
    # (conv_0 + conv_1) = 792 audio-s/s (+16% over the unpacked 683); depth
    # 3 = 659 (−3.5%) — conv_2's dense expansion inflates its 54 GFLOP by
    # 4.3×, which its lane gain cannot repay.  Default 2.
    depth = int(os.environ.get("VIBRAVOX_PACKED_DISC_DEPTH", "2"))
    if conv2 is not None and depth >= 3 and (t // _P) % 2 == 0:
        # free repack at p=4: (B, T/8, [i2][64]) row pairs → (B, T/16,
        # [i4][64]) — sample index 4τ+i4 with i4 = 2·parity + i2
        z2 = h.reshape(b, t // 16, 4 * c1_feats)
        w2, b2 = conv2
        k2 = w2.shape[0]
        y2 = _pconv(z2, (dense_from_grouped(w2, groups), b2),
                    stride=4, pad_left=(k2 - 1) // 2, p_in=4, p_out=1)
        out.append(_leaky(y2, slope))
    return out
