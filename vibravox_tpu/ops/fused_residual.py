"""Fused EBEN residual stack (3 dilated ResidualUnits) — Pallas TPU kernels.

A ResidualUnit is ``x + leaky(pointwise(dilated_k3(x)))`` (reference
``eben_generator.py:287-316``); the encoder/decoder blocks chain three of
them (dilations 1, 3, 9).  As separate XLA convs each unit round-trips its
(B, T, C) activations through HBM — and with C ∈ {16..64} the default
C-minor layout pads the 128-wide lanes, so every trip moves up to 4x the
useful bytes.  Profiled on the round-2 backend, these stacks dominate the
generator's backward (~360-470 us per conv op at C=32, T≈10k).

The fused kernels keep the whole 3-unit chain in VMEM.  Two structural
choices matter for speed on this target:

* **Shift after the matmul.**  A dilated tap needs ``x[t±d]``; instead of
  rotating the bf16 activations (Mosaic only rotates 32-bit data, so a bf16
  roll costs two casts), every tap matmul runs on the *unshifted* tile and
  the f32 product is rotated: ``h1 = roll(x@W0, d) + x@W1 + roll(x@W2, -d)``.
  The same trick moves the backward's shifts onto the (already f32)
  cotangents, and the weight gradients become full-row contractions against
  a masked, rotated cotangent — no bf16 rotate anywhere.
* **Batch flattened into the row axis.**  The grid is 1-D over row blocks of
  the (B·T, C) view, halving-to-quartering the number of grid cells (cell
  fixed costs dominated the first version).  Cross-element contamination at
  batch seams stays within the 13-row receptive field, i.e. entirely inside
  the stitched edge region (below), so values AND gradients remain exact.

forward — per tile (TB rows + 16-row halo/side): DMA; 4 matmuls + 2 f32
    rolls per unit; write TB rows.  Roll wrap-around pollutes only the halo.

backward — recomputes x1, x2 from the x tile (32-row halo), runs the
    hand-derived chain rule in VMEM; dW contributions contract ALL rows
    against the cotangent masked to the owned TB rows (exact cross-tile
    partition), accumulated into constant-index output blocks across the
    whole grid; dx is emitted for the owned rows (cotangent halo makes
    cross-tile terms exact).

Reflect-pad edges: in-kernel halos see zero padding / neighbor elements, so
the first/last 16 output samples of every batch element are recomputed by
the plain XLA path on an 80-sample window (whose own reflect padding matches
the full signal's) and stitched in with ``.at[].set`` — exact edge semantics
for both values and gradients at negligible cost.

``residual_stack`` dispatches: plain XLA convs on CPU / when disabled
(``VIBRAVOX_FUSED_RU=0``), fused Pallas kernels + edge stitching on TPU.
Exactness vs the plain path is pinned by tests (forward and full vjp).
"""

from __future__ import annotations

import functools
import os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vibravox_tpu.ops.conv import conv1d

__all__ = ["residual_stack"]

_TB = 1024     # owned rows per tile
_HALO = 16     # fwd halo per side (>= sum(dilations) = 13, sublane-aligned)
_HALO_B = 32   # bwd halo per side (>= 2 * 13, sublane-aligned)
_EDGE_W = 80   # XLA edge-window length (>= _HALO + 13 + right-pollution margin)

Kernels = Tuple[Tuple[jnp.ndarray, jnp.ndarray], ...]  # ((Wd (3,C,C), Wp (C,C)), ...)


def _roll32(x, shift: int):
    """Cyclic sublane rotate of an f32 array (non-negative amount)."""
    return pltpu.roll(x, shift % x.shape[0], axis=0)


def _leaky(x, slope):
    return jnp.where(x >= 0, x, slope * x)


def _plain_stack(x: jnp.ndarray, kernels: Kernels, dilations, slope) -> jnp.ndarray:
    """Reference XLA implementation (also used for the edge windows)."""
    for (wd, wp), d in zip(kernels, dilations):
        h = conv1d(x, wd, padding="same", dilation=int(d), pad_mode="reflect")
        h = conv1d(h, wp, padding="same", pad_mode="reflect")
        x = x + _leaky(h, slope)
    return x


def _use_pallas() -> bool:
    # opt-in: measured round 2, the fused kernels lose to XLA's conv
    # lowering by ~15-20% at the EBEN shapes — the per-tile MXU pass count
    # (3 taps × C≤64 padded to 128 lanes) binds, and XLA fuses the
    # leaky/add epilogues it would otherwise save. Kept as pinned-correct
    # infrastructure for a packed (space-to-depth) variant.
    return os.environ.get("VIBRAVOX_FUSED_RU", "0") == "1"


def _pad_channels(c: int) -> int:
    """DMA slices need 128-aligned lane dims; HBM stores them padded anyway."""
    return -(-c // 128) * 128


def _pad_w(wd, wp, c: int, cp: int):
    """(3c, c)/(c, c) tap matrices onto the lane-padded (3cp, cp)/(cp, cp)
    grid; zero pad rows/cols keep the padded activation lanes inert."""
    if cp == c:
        return wd, wp
    w3 = wd.reshape(3, c, c)
    wdp = jnp.zeros((3, cp, cp), wd.dtype).at[:, :c, :c].set(w3).reshape(3 * cp, cp)
    wpp = jnp.zeros((cp, cp), wp.dtype).at[:c, :c].set(wp)
    return wdp, wpp


def _flat_rows(x):
    """(B, T, C) -> (B*T, C) row view (seam pollution lands in the stitched
    edge regions)."""
    return x.reshape(x.shape[0] * x.shape[1], x.shape[2])


# --------------------------------------------------------------------------- #
# forward kernel
# --------------------------------------------------------------------------- #


def _h1(cur, wd_ref, d: int, c: int):
    """Dilated-tap pre-activation via shift-after-matmul (f32)."""
    y0 = jnp.dot(cur, wd_ref[0:c, :], preferred_element_type=jnp.float32)
    y1 = jnp.dot(cur, wd_ref[c:2 * c, :], preferred_element_type=jnp.float32)
    y2 = jnp.dot(cur, wd_ref[2 * c:3 * c, :], preferred_element_type=jnp.float32)
    return _roll32(y0, d) + y1 + _roll32(y2, -d)


def _unit_forward(cur, wd_ref, wp_ref, d: int, c: int, slope: float):
    """One ResidualUnit on an extended (R, C) tile; edges polluted <= d rows."""
    h1 = _h1(cur, wd_ref, d, c).astype(cur.dtype)
    h2 = jnp.dot(h1, wp_ref[:], preferred_element_type=jnp.float32)
    return cur + _leaky(h2, jnp.float32(slope)).astype(cur.dtype)


def _fwd_kernel(x_hbm, wd0, wp0, wd1, wp1, wd2, wp2, out_ref, *,
                dil: Tuple[int, ...], c: int, slope: float, tb: int, halo: int):
    i = pl.program_id(0)

    def body(xs, sem):
        rows = tb + 2 * halo
        dma = pltpu.make_async_copy(x_hbm.at[pl.ds(i * tb, rows), :], xs, sem)
        dma.start()
        dma.wait()
        cur = xs[:]
        for (wd, wp), d in zip(((wd0, wp0), (wd1, wp1), (wd2, wp2)), dil):
            cur = _unit_forward(cur, wd, wp, int(d), c, slope)
        out_ref[...] = cur[halo:halo + tb]

    pl.run_scoped(
        body,
        xs=pltpu.VMEM((tb + 2 * halo, x_hbm.shape[-1]), x_hbm.dtype),
        sem=pltpu.SemaphoreType.DMA,
    )


@functools.partial(jax.jit, static_argnums=(7, 8, 9))
def _pallas_forward(x, wd0, wp0, wd1, wp1, wd2, wp2, dilations, slope, c):
    batch, t = x.shape[0], x.shape[1]
    rows = batch * t
    tblocks = pl.cdiv(rows, _TB)
    r_pad = tblocks * _TB
    cp = _pad_channels(c)
    xf = _flat_rows(x)
    # front halo + tail padding for the last tile's DMA reads; lane padding
    xp = jnp.pad(xf, [(_HALO, r_pad + _HALO - rows), (0, cp - c)])
    (wd0, wp0), (wd1, wp1), (wd2, wp2) = (
        _pad_w(wd0, wp0, c, cp), _pad_w(wd1, wp1, c, cp), _pad_w(wd2, wp2, c, cp)
    )
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, dil=dilations, c=cp, slope=slope,
                          tb=_TB, halo=_HALO),
        out_shape=jax.ShapeDtypeStruct((r_pad, cp), x.dtype),
        grid=(tblocks,),
        interpret=jax.devices()[0].platform == "cpu",
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec((_TB, cp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(xp, wd0, wp0, wd1, wp1, wd2, wp2)
    return out[:rows, :c].reshape(batch, t, c)


# --------------------------------------------------------------------------- #
# backward kernel
# --------------------------------------------------------------------------- #


def _bwd_kernel(x_hbm, g_hbm, wd0, wp0, wd1, wp1, wd2, wp2,
                dx_ref, dwd0, dwp0, dwd1, dwp1, dwd2, dwp2, *,
                dil: Tuple[int, ...], c: int, slope: float, tb: int, halo: int):
    i = pl.program_id(0)
    first = i == 0

    def body(xs, gs, xsem, gsem):
        rows = tb + 2 * halo
        xdma = pltpu.make_async_copy(x_hbm.at[pl.ds(i * tb, rows), :], xs, xsem)
        gdma = pltpu.make_async_copy(g_hbm.at[pl.ds(i * tb, rows), :], gs, gsem)
        xdma.start()
        gdma.start()
        xdma.wait()

        wds = (wd0, wd1, wd2)
        wps = (wp0, wp1, wp2)
        dwds = (dwd0, dwd1, dwd2)
        dwps = (dwp0, dwp1, dwp2)
        sl = jnp.asarray(slope, jnp.float32)
        # mask for the owned rows: dW contracts the full tile against the
        # masked cotangent — an exact partition of the global sum over tiles
        ridx = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
        own_mask = jnp.logical_and(ridx >= halo, ridx < halo + tb).astype(jnp.float32)

        # recompute the unit inputs x0, x1, x2 on the extended tile
        xi = [xs[:]]
        for u in range(2):
            xi.append(_unit_forward(xi[-1], wds[u], wps[u], int(dil[u]), c, slope))
        gdma.wait()
        dy = gs[:].astype(jnp.float32)

        nt = (((1,), (1,)), ((), ()))   # contract dim 1 of both (A @ B^T)
        rr = (((0,), (0,)), ((), ()))   # contract rows of both (A^T @ B)
        for u in (2, 1, 0):
            d = int(dil[u])
            cur = xi[u]
            h1 = _h1(cur, wds[u], d, c)                         # (R, C) f32
            h1b = h1.astype(cur.dtype)
            h2 = jnp.dot(h1b, wps[u][:], preferred_element_type=jnp.float32)
            dh2 = dy * jnp.where(h2 >= 0, 1.0, sl)
            dh2b = dh2.astype(cur.dtype)
            dwp_c = jax.lax.dot_general(
                h1b[halo:halo + tb], dh2b[halo:halo + tb], rr,
                preferred_element_type=jnp.float32)
            dh1 = jax.lax.dot_general(dh2b, wps[u][:], nt,
                                      preferred_element_type=jnp.float32)
            dh1b = dh1.astype(cur.dtype)
            # dW taps: full-row contraction of unshifted x against the
            # masked, rotated cotangent (shift-after-matmul transposed):
            #   dW_tap0 = Σ_own x[t-d]·dh1[t] = x^T @ roll(dh1·mask, -d)
            dh1m = dh1 * own_mask
            dwd_c = jnp.concatenate([
                jax.lax.dot_general(
                    cur, _roll32(dh1m, -d).astype(cur.dtype), rr,
                    preferred_element_type=jnp.float32),
                jax.lax.dot_general(
                    cur, dh1m.astype(cur.dtype), rr,
                    preferred_element_type=jnp.float32),
                jax.lax.dot_general(
                    cur, _roll32(dh1m, d).astype(cur.dtype), rr,
                    preferred_element_type=jnp.float32),
            ], axis=0)                                          # (3C, C)
            # dx: spread dh1 back through the taps
            wd = wds[u][:]
            dx = dy
            dx += _roll32(
                jax.lax.dot_general(dh1b, wd[0:c, :], nt,
                                    preferred_element_type=jnp.float32), -d)
            dx += jax.lax.dot_general(dh1b, wd[c:2 * c, :], nt,
                                      preferred_element_type=jnp.float32)
            dx += _roll32(
                jax.lax.dot_general(dh1b, wd[2 * c:3 * c, :], nt,
                                    preferred_element_type=jnp.float32), d)
            dy = dx

            @pl.when(first)
            def _(u=u, dwd_c=dwd_c, dwp_c=dwp_c):
                dwds[u][...] = dwd_c
                dwps[u][...] = dwp_c

            @pl.when(jnp.logical_not(first))
            def _(u=u, dwd_c=dwd_c, dwp_c=dwp_c):
                dwds[u][...] = dwds[u][...] + dwd_c
                dwps[u][...] = dwps[u][...] + dwp_c

        dx_ref[...] = dy[halo:halo + tb].astype(dx_ref.dtype)

    pl.run_scoped(
        body,
        xs=pltpu.VMEM((tb + 2 * halo, x_hbm.shape[-1]), x_hbm.dtype),
        gs=pltpu.VMEM((tb + 2 * halo, g_hbm.shape[-1]), g_hbm.dtype),
        xsem=pltpu.SemaphoreType.DMA,
        gsem=pltpu.SemaphoreType.DMA,
    )


@functools.partial(jax.jit, static_argnums=(8, 9, 10))
def _pallas_backward(x, g, wd0, wp0, wd1, wp1, wd2, wp2, dilations, slope, c):
    batch, t = x.shape[0], x.shape[1]
    rows = batch * t
    tblocks = pl.cdiv(rows, _TB)
    r_pad = tblocks * _TB
    halo = _HALO_B
    cp = _pad_channels(c)
    xp = jnp.pad(_flat_rows(x), [(halo, r_pad + halo - rows), (0, cp - c)])
    gp = jnp.pad(_flat_rows(g), [(halo, r_pad + halo - rows), (0, cp - c)])
    (wd0, wp0), (wd1, wp1), (wd2, wp2) = (
        _pad_w(wd0, wp0, c, cp), _pad_w(wd1, wp1, c, cp), _pad_w(wd2, wp2, c, cp)
    )
    wshape = jax.ShapeDtypeStruct((3 * cp, cp), jnp.float32)
    pshape = jax.ShapeDtypeStruct((cp, cp), jnp.float32)
    const = pl.BlockSpec((3 * cp, cp), lambda i: (0, 0), memory_space=pltpu.VMEM)
    constp = pl.BlockSpec((cp, cp), lambda i: (0, 0), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, dil=dilations, c=cp, slope=slope,
                          tb=_TB, halo=halo),
        out_shape=(
            jax.ShapeDtypeStruct((r_pad, cp), x.dtype),
            wshape, pshape, wshape, pshape, wshape, pshape,
        ),
        grid=(tblocks,),
        interpret=jax.devices()[0].platform == "cpu",
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=(
            pl.BlockSpec((_TB, cp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            const, constp, const, constp, const, constp,
        ),
    )(xp, gp, wd0, wp0, wd1, wp1, wd2, wp2)
    dx = outs[0][:rows, :c].reshape(batch, t, c)
    if cp == c:
        return dx, outs[1:]
    dws = []
    for k, dw in enumerate(outs[1:]):
        if k % 2 == 0:  # dilated (3cp, cp) -> (3c, c)
            dws.append(dw.reshape(3, cp, cp)[:, :c, :c].reshape(3 * c, c))
        else:
            dws.append(dw[:c, :c])
    return dx, tuple(dws)


# --------------------------------------------------------------------------- #
# custom-vjp wiring + edge stitching
# --------------------------------------------------------------------------- #


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _fused_interior(x, wd0, wp0, wd1, wp1, wd2, wp2, dilations, slope, c):
    return _pallas_forward(x, wd0, wp0, wd1, wp1, wd2, wp2, dilations, slope, c)


def _fused_fwd(x, wd0, wp0, wd1, wp1, wd2, wp2, dilations, slope, c):
    y = _pallas_forward(x, wd0, wp0, wd1, wp1, wd2, wp2, dilations, slope, c)
    return y, (x, wd0, wp0, wd1, wp1, wd2, wp2)


def _fused_bwd(dilations, slope, c, res, g):
    x, wd0, wp0, wd1, wp1, wd2, wp2 = res
    dx, dws = _pallas_backward(x, g, wd0, wp0, wd1, wp1, wd2, wp2,
                               dilations, slope, c)
    return (dx,) + tuple(dw.astype(w.dtype) for dw, w in
                         zip(dws, (wd0, wp0, wd1, wp1, wd2, wp2)))


_fused_interior.defvjp(_fused_fwd, _fused_bwd)


def residual_stack(
    x: jnp.ndarray,
    kernels: Kernels,
    dilations: Sequence[int] = (1, 3, 9),
    slope: float = 0.01,
) -> jnp.ndarray:
    """Three chained ResidualUnits on NWC audio.

    ``kernels``: per unit, ``(wd, wp)`` — the *effective* (weight-normalized)
    dilated kernel ``(3, C, C)`` WIO and pointwise kernel ``(1, C, C)`` WIO.
    """
    dilations = tuple(int(d) for d in dilations)
    c = x.shape[-1]
    t = x.shape[1]
    if not _use_pallas() or t < 4 * _EDGE_W or c % 8 != 0:
        # space-to-depth packed path (dense 128-lane convs) when the shape
        # allows; plain XLA convs otherwise — see ops/packed_residual.py
        from vibravox_tpu.ops.packed_residual import can_pack, packed_residual_stack

        if can_pack(t, c, b=x.shape[0]):
            return packed_residual_stack(x, kernels, dilations, slope)
        return _plain_stack(x, kernels, dilations, slope)

    # Pallas path: stacked (3C, C) tap matrices, f32 masters cast to compute
    flat = []
    for wd, wp in kernels:
        flat.append(wd.reshape(3 * c, c).astype(x.dtype))
        flat.append(wp.reshape(c, c).astype(x.dtype))
    y = _fused_interior(x, *flat, dilations, float(slope), c)

    # exact reflect-pad edges from the plain path on short windows
    edge = _HALO
    left = _plain_stack(x[:, :_EDGE_W], kernels, dilations, slope)[:, :edge]
    right = _plain_stack(x[:, -_EDGE_W:], kernels, dilations, slope)[:, -edge:]
    y = y.at[:, :edge].set(left)
    y = y.at[:, t - edge:].set(right)
    return y
