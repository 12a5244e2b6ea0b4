"""Space-to-depth packed SEANet encoder stem (pure XLA).

The regressive-Mimi train step (``tasks/regressive_mimi.py``) is two SEANet
encoder forwards plus one backward, and the per-op profile
(``scripts/profile_task_step.py --task mimi``) attributes the largest single
items to the encoder's FULL-RATE segment: ``conv_in`` (k7, 1→64),
``block_0_res_0`` (k3 64→32, k1 32→64) and ``down_0`` (k8 s4 64→128), all
running at the 24 kHz sample rate (T ≈ 60k for 2.5 s clips).  At C ≤ 64 the
channels fill ≤ half of the TPU's 128 vector lanes and the op cost is bound
by rows moved, exactly the regime where EBEN's packed residual stacks won
+19% (``ops/packed_residual.py``).

This module packs ``p = first_ratio`` consecutive samples into the channel
axis — ``(B, T, C) → (B, T/p, p·C)``, a free reshape in C-minor layout — and
runs the whole full-rate segment as dense wide-lane convolutions.  The
strided ``down_0`` conv (stride = p, kernel 2p) consumes the packed rows at
stride 1 and emits the natural UNPACKED ``(B, T/p, 2F)`` layout, so the
packed domain ends exactly where the channel count reaches 128.

Unlike EBEN's reflect-padded stacks, SEANet's causal ZERO padding makes the
packed path **exact**: zero packed rows left of t=0 are precisely the zero
samples the causal pad inserts, so no edge stitching is needed.  Values and
the full vjp are pinned against the plain path in
``tests/test_packed_seanet.py``.

Reference equivalence: the stem layers correspond to the first SEANet stage
of the codec the reference loads via ``moshi`` (``regressive_mimi.py:24-30``).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from vibravox_tpu.ops.conv import conv1d

__all__ = [
    "pack_causal_kernel",
    "pack_transpose_kernel",
    "packed_encoder_stem",
    "packed_decoder_tail",
    "stem_packable",
    "tail_packable",
]

KernelBias = Tuple[jnp.ndarray, Optional[jnp.ndarray]]

# the exact primitive the plain path applies (flax nn.elu is jax.nn.elu)
_elu = jax.nn.elu


def stem_packable(t: int, in_ch: int, n_filters: int, p: int) -> bool:
    """Admissibility + profitability: only the waveform input (C=1), only
    when the packed width reaches a full 128-lane register, and only when
    the time axis divides (Mimi pads to 1920-sample frames upstream)."""
    return (
        os.environ.get("VIBRAVOX_PACKED_SEANET", "1") == "1"
        and in_ch == 1
        and p >= 2
        and t % p == 0
        and p * n_filters >= 128
    )


def pack_causal_kernel(
    w: jnp.ndarray,
    *,
    stride: int,
    pad_left: int,
    p_in: int,
    p_out: int,
    dilation: int = 1,
) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """Pack a causal conv kernel into the space-to-depth domain.

    ``w`` is WIO ``(K, Cin, Cout)``; the input is packed at ``p_in`` samples
    per row, the output at ``p_out`` (``stride * p_out == p_in`` keeps rows
    aligned).  Output sample ``p_out·τ + i`` reads input offset
    ``o = stride·i − pad_left + k·dilation`` relative to ``p_in·τ``, i.e.
    packed row ``ρ = ⌊o/p_in⌋``, sub-index ``σ = o mod p_in``.  Returns the
    packed kernel ``(S, p_in·Cin, p_out·Cout)`` plus the (left, right)
    packed-row padding that reproduces the causal zero padding exactly.
    Linear in ``w``, so autodiff projects packed-kernel cotangents back onto
    the true taps automatically.
    """
    if stride * p_out != p_in:
        raise ValueError(f"stride {stride} x p_out {p_out} != p_in {p_in}")
    k_taps, cin, cout = w.shape
    entries = []
    for i in range(p_out):
        for k in range(k_taps):
            o = stride * i - pad_left + k * dilation
            entries.append((o // p_in, o % p_in, i, k))
    r_min = min(e[0] for e in entries)
    r_max = max(e[0] for e in entries)
    kp = jnp.zeros((r_max - r_min + 1, p_in * cin, p_out * cout), w.dtype)
    for rho, sigma, i, k in entries:
        kp = kp.at[
            rho - r_min,
            sigma * cin : (sigma + 1) * cin,
            i * cout : (i + 1) * cout,
        ].add(w[k])
    return kp, (-r_min, r_max)


def tail_packable(n_filters: int, p: int) -> bool:
    """Decoder-side admissibility: the last upsample stage emits C=n_filters
    at full rate; packing pays once the packed width fills the lanes."""
    return (
        os.environ.get("VIBRAVOX_PACKED_SEANET", "1") == "1"
        and p >= 2
        and p * n_filters >= 128
    )


def pack_transpose_kernel(
    w_t: jnp.ndarray, *, stride: int
) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """Pack a causal transposed-conv kernel into the space-to-depth domain.

    ``w_t`` is the torch layout ``(Cin, Cout, K)`` (see
    ``ops/conv.py::conv_transpose1d``).  The transpose conv with stride
    ``s = stride`` maps input row ``m`` onto outputs ``n = s·m + k``; with
    the causal right-trim of ``K − s`` the output length is exactly ``s·T``.
    Packing the output at ``p = s``: output row ``τ`` sub-index ``i``
    collects ``x[τ − ρ] · w[:, :, s·ρ + i]`` — a stride-1 conv over the
    *input* rows with kernel ``(ρ_max+1, Cin, s·Cout)`` and left padding
    ``ρ_max``.  Exact: the zero left pad is the absent ``m < 0`` region and
    the trimmed right overhang is never produced.
    """
    cin, cout, k_taps = w_t.shape
    p = stride
    entries = [
        (i, k, (k - i) // p) for i in range(p) for k in range(i, k_taps, p)
    ]
    r_max = max(e[2] for e in entries)
    kp = jnp.zeros((r_max + 1, cin, p * cout), w_t.dtype)
    for i, k, rho in entries:
        # conv orientation: tap j reads x[τ - r_max + j] → ρ = r_max - j
        kp = kp.at[r_max - rho, :, i * cout : (i + 1) * cout].add(w_t[:, :, k])
    return kp, (r_max, 0)


def _pconv(
    z: jnp.ndarray,
    kb: KernelBias,
    *,
    stride: int,
    pad_left: int,
    p_in: int,
    p_out: int,
    dilation: int = 1,
) -> jnp.ndarray:
    w, b = kb
    kp, pads = pack_causal_kernel(
        w.astype(z.dtype), stride=stride, pad_left=pad_left,
        p_in=p_in, p_out=p_out, dilation=dilation,
    )
    y = conv1d(z, kp, padding=pads)
    if b is not None:
        y = y + jnp.tile(b, p_out).astype(y.dtype)
    return y


def packed_encoder_stem(
    x: jnp.ndarray,
    conv_in: KernelBias,
    res_blocks: Sequence[Tuple[KernelBias, KernelBias]],
    down: KernelBias,
    *,
    p: int,
    dilations: Sequence[int],
    compute_dtype: Optional[str] = None,
) -> jnp.ndarray:
    """Full-rate SEANet encoder segment in the packed domain.

    ``x`` (B, T, 1) → stem output (B, T/p, 2F): conv_in, the first stage's
    residual blocks (ELU → k3 dilated → ELU → k1 pointwise → add), ELU, then
    the stride-p downsample conv whose output leaves the packed domain.
    Matches ``SEANetEncoder``'s plain ops 1:1 (same dtype flow: bf16 convs
    when ``compute_dtype`` is set, residual adds in the conv dtype).
    """
    b, t, cin = x.shape
    dt = jnp.dtype(compute_dtype) if compute_dtype else x.dtype
    z = x.reshape(b, t // p, p * cin).astype(dt)

    k_in = conv_in[0].shape[0]
    h = _pconv(z, conv_in, stride=1, pad_left=k_in - 1, p_in=p, p_out=p)

    for (c0, c1), d in zip(res_blocks, dilations):
        r = _elu(h)
        k0 = c0[0].shape[0]
        r = _pconv(r, c0, stride=1, pad_left=(k0 - 1) * int(d),
                   p_in=p, p_out=p, dilation=int(d))
        r = _elu(r)
        r = _pconv(r, c1, stride=1, pad_left=0, p_in=p, p_out=p)
        h = h + r.astype(h.dtype)

    h = _elu(h)
    # stride-p conv, kernel 2p, causal pad_total = p → spans exactly two
    # packed rows; each packed row emits one output frame (p_out = 1)
    return _pconv(h, down, stride=p, pad_left=p, p_in=p, p_out=1)


def packed_decoder_tail(
    h: jnp.ndarray,
    up: KernelBias,
    res_blocks: Sequence[Tuple[KernelBias, KernelBias]],
    conv_out: KernelBias,
    *,
    p: int,
    dilations: Sequence[int],
    compute_dtype: Optional[str] = None,
) -> jnp.ndarray:
    """Full-rate SEANet decoder segment in the packed domain.

    ``h`` (B, T', C) → waveform (B, p·T', 1): the last stage's stride-p
    transposed conv emits directly INTO the packed domain, the residual
    blocks run packed, and the final conv (f32, matching the plain path's
    cast) unpacks via a free reshape.  Mirrors ``SEANetDecoder``'s last
    loop iteration + tail ops 1:1 (the pre-up ELU stays with the caller at
    the low rate).
    """
    b, t, _ = h.shape
    dt = jnp.dtype(compute_dtype) if compute_dtype else h.dtype
    h = h.astype(dt)

    w_up, b_up = up
    kp, pads = pack_transpose_kernel(w_up.astype(dt), stride=p)
    y = conv1d(h, kp, padding=pads)
    if b_up is not None:
        y = y + jnp.tile(b_up, p).astype(y.dtype)

    for (c0, c1), d in zip(res_blocks, dilations):
        r = _elu(y)
        k0 = c0[0].shape[0]
        r = _pconv(r, c0, stride=1, pad_left=(k0 - 1) * int(d),
                   p_in=p, p_out=p, dilation=int(d))
        r = _elu(r)
        r = _pconv(r, c1, stride=1, pad_left=0, p_in=p, p_out=p)
        y = y + r.astype(y.dtype)

    y = _elu(y)
    # final conv back to f32 (the plain path casts before conv_out)
    k_out = conv_out[0].shape[0]
    out = _pconv(y.astype(jnp.float32), conv_out, stride=1,
                 pad_left=k_out - 1, p_in=p, p_out=p)
    return out.reshape(b, p * t, conv_out[0].shape[-1])
