"""Space-to-depth packed EBEN residual stacks (pure XLA).

The EBEN generator's hot residual stacks run at C ∈ {32, 64} over long time
axes (``eben_generator.py:287-316`` in the reference; ``_residual_stack``
here).  In the default C-minor layout those channels fill only 32/128 or
64/128 of the TPU's vector lanes, so every conv moves up to 4x the useful
HBM bytes and the MXU processes 4x the rows it needs to.

This module packs ``p = 128 // C`` consecutive time samples into the channel
axis — ``(B, T, C) -> (B, T/p, p·C=128)`` (a free reshape in C-minor
layout) — and runs the whole 3-unit chain as *dense 128-lane* convolutions:

* the k=3 dilated conv becomes one packed conv whose kernel spans
  ``S = max_ρ − min_ρ + 1`` packed taps, where ``ρ = floor((i + (k−1)d)/p)``
  over output sub-index i and tap k.  Each (τ, i′, i) block of the packed
  kernel is the original ``(C, C)`` tap matrix or zero;
* the pointwise conv becomes a block-diagonal 128×128 matmul;
* residual add + leaky-ReLU are elementwise and packing-invariant.

Row-matmul count for the C=32 stack drops from 12·T (at 25 % lane fill) to
4·T (dense): tap spans S = 3/3/7 for d = 1/3/9 at p = 4, plus one pointwise
tap each.  FLOPs rise (dense blocks multiply zeros), but these convs run far
below the MXU roofline — rows moved × passes is what binds (CLAUDE.md).

Packed interior convs use zero padding, which corrupts only the stack's
13-sample receptive field at each end; the first/last ``_EDGE`` samples are
recomputed by the plain XLA path on a short window whose own reflect padding
matches the full signal's, and stitched in — the same exact-edge scheme as
``ops/fused_residual.py``.  Values and the full vjp are pinned against the
plain path in ``tests/test_packed_residual.py``.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp

from vibravox_tpu.ops.conv import conv1d

__all__ = ["packed_residual_stack", "can_pack"]

_EDGE = 16     # stitched samples per side (> 13-sample receptive field)
_EDGE_W = 80   # plain-path edge window length

Kernels = Tuple[Tuple[jnp.ndarray, jnp.ndarray], ...]


def _leaky(x, slope):
    return jnp.where(x >= 0, x, slope * x)


def _plain_stack(x, kernels, dilations, slope):
    for (wd, wp), d in zip(kernels, dilations):
        h = conv1d(x, wd, padding="same", dilation=int(d), pad_mode="reflect")
        h = conv1d(h, wp, padding="same", pad_mode="reflect")
        x = x + _leaky(h, slope)
    return x


def can_pack(t: int, c: int, lanes: int = 128, b: Optional[int] = None) -> bool:
    """Shape admissibility + profitability.  The batch bound mirrors the
    measured crossover on the v5e: packing wins while the step is
    op-count-bound (batch-32 GAN step +19%) and turns slightly negative once
    the batch is large enough that the stacks are compute/HBM-bound
    (batch 128: −1%)."""
    p = lanes // c if c and lanes % c == 0 else 0
    if b is not None and b > 64:
        return False
    return p >= 2 and t % p == 0 and t >= 4 * _EDGE_W


def _pack_dilated(wd: jnp.ndarray, d: int, p: int) -> Tuple[jnp.ndarray, int]:
    """(3, C, C) dilated-tap kernel -> (S, pC, pC) packed kernel + left pad.

    Output sub-index ``i`` reading tap ``k`` touches input offset
    ``o = i + (k−1)·d`` → packed row offset ``ρ = floor(o/p)``, input
    sub-index ``σ = o mod p``.  Linear in ``wd``, so autodiff projects the
    packed-kernel cotangent back onto the 3 true taps automatically.
    """
    c = wd.shape[-1]
    offs = [i + (k - 1) * d for i in range(p) for k in range(3)]
    r_min = min(o // p for o in offs)
    r_max = max(o // p for o in offs)
    s = r_max - r_min + 1
    kp = jnp.zeros((s, p * c, p * c), wd.dtype)
    for i in range(p):
        for k in range(3):
            o = i + (k - 1) * d
            kp = kp.at[
                o // p - r_min,
                (o % p) * c : (o % p + 1) * c,
                i * c : (i + 1) * c,
            ].add(wd[k])
    return kp, -r_min


def _pack_pointwise(wp: jnp.ndarray, p: int) -> jnp.ndarray:
    """(1, C, C) pointwise kernel -> (1, pC, pC) block-diagonal kernel."""
    c = wp.shape[-1]
    kp = jnp.zeros((1, p * c, p * c), wp.dtype)
    for i in range(p):
        kp = kp.at[0, i * c : (i + 1) * c, i * c : (i + 1) * c].set(wp[0])
    return kp


def _enabled() -> bool:
    # default ON: measured round 3 on the v5e at the batch-32 GAN recipe
    # (batched-disc + per-leaf adam step): packed 683 vs plain 574
    # audio-s/s (+19%).  An earlier neutral reading (640.6 vs 636.0) was
    # confounded by the optax.flatten relayout copies masking the gain.
    # Note the packed kernels' dense zero blocks add counted-but-useless
    # FLOPs, so cost-analysis MFU overstates with this path on.
    return os.environ.get("VIBRAVOX_PACKED_RU", "1") == "1"


def packed_residual_stack(
    x: jnp.ndarray,
    kernels: Kernels,
    dilations: Sequence[int] = (1, 3, 9),
    slope: float = 0.01,
    lanes: int = 128,
) -> jnp.ndarray:
    """Three chained ResidualUnits via space-to-depth packing (see module
    docstring).  Falls back to the plain path when packing doesn't apply."""
    dilations = tuple(int(d) for d in dilations)
    b, t, c = x.shape
    if not _enabled() or not can_pack(t, c, lanes, b):
        return _plain_stack(x, kernels, dilations, slope)
    p = lanes // c

    z = x.reshape(b, t // p, p * c)
    for (wd, wp), d in zip(kernels, dilations):
        kd, pad_left = _pack_dilated(wd.astype(x.dtype), d, p)
        s = kd.shape[0]
        h = conv1d(z, kd, padding=(pad_left, s - 1 - pad_left))
        h = conv1d(h, _pack_pointwise(wp.astype(x.dtype), p), padding=0)
        z = z + _leaky(h, slope)
    y = z.reshape(b, t, c)

    # exact reflect-pad edges from the plain path on short windows
    left = _plain_stack(x[:, :_EDGE_W], kernels, dilations, slope)[:, :_EDGE]
    right = _plain_stack(x[:, -_EDGE_W:], kernels, dilations, slope)[:, -_EDGE:]
    y = y.at[:, :_EDGE].set(left)
    y = y.at[:, t - _EDGE :].set(right)
    return y
