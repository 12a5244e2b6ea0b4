"""1-D convolution primitives in channels-last (NWC) layout.

All tensors in this framework are channels-last ``(batch, time, channels)`` —
the idiomatic XLA-TPU layout (time tiles onto sublanes, channels onto the
128-wide lanes).  The reference framework is NCW/PyTorch
(``vibravox/torch_modules/...``); converters for its weight layouts live here
so pretrained checkpoints stay loadable.

Conv weight layout: ``(kernel, in_channels // groups, out_channels)`` (WIO).
Transposed-conv weights are stored in the torch layout
``(in_channels, out_channels // groups, kernel)`` and converted on the fly —
the conversion is a tiny host-free transpose that XLA folds into the op.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

PaddingSpec = Union[str, int, Tuple[int, int]]

__all__ = [
    "reflect_pad",
    "conv1d",
    "conv_transpose1d",
    "grouped_conv1d_spmd_safe",
    "polyphase_upsample_conv",
    "same_pad_amount",
    "torch_conv_weight_to_wio",
    "wio_to_torch_conv_weight",
]


def same_pad_amount(kernel: int, dilation: int = 1) -> Tuple[int, int]:
    """Total 'same' padding split like torch (left gets the smaller half)."""
    total = (kernel - 1) * dilation
    left = total // 2
    return left, total - left


def reflect_pad(x: jnp.ndarray, pad: Tuple[int, int]) -> jnp.ndarray:
    """Reflection-pad the time axis of an NWC tensor."""
    if pad == (0, 0):
        return x
    return jnp.pad(x, ((0, 0), pad, (0, 0)), mode="reflect")


def _norm_padding(padding: PaddingSpec, kernel: int, dilation: int) -> Tuple[int, int]:
    if isinstance(padding, str):
        if padding.lower() == "same":
            return same_pad_amount(kernel, dilation)
        if padding.lower() == "valid":
            return (0, 0)
        raise ValueError(f"Unknown padding {padding!r}")
    if isinstance(padding, int):
        return (padding, padding)
    return tuple(padding)  # type: ignore[return-value]


def conv1d(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    *,
    stride: int = 1,
    padding: PaddingSpec = 0,
    dilation: int = 1,
    groups: int = 1,
    pad_mode: str = "zeros",
    precision=None,
) -> jnp.ndarray:
    """1-D convolution on NWC input with WIO weight (kernel, cin//groups, cout).

    Mirrors ``torch.nn.functional.conv1d`` numerics (cross-correlation), so a
    converted torch weight gives bit-equivalent-modulo-float results.
    ``pad_mode`` is one of ``zeros`` / ``reflect`` (torch ``padding_mode``).

    Strided convs (stride > 1, dilation 1) carry a hand-written vjp: XLA
    autodiff emits an lhs-dilated gradient conv for the input cotangent,
    which this backend lowers pathologically (CLAUDE.md); the custom
    backward re-expresses it as a dense polyphase conv.
    """
    kernel = weight.shape[0]
    pad = _norm_padding(padding, kernel, dilation)
    if pad_mode == "reflect" and pad != (0, 0):
        x = reflect_pad(x, pad)
        pad = (0, 0)
    if weight.dtype != x.dtype:
        # mixed-precision policy flows from the activations: f32 master
        # weights are cast to the compute dtype (bf16 on TPU) at use site
        weight = weight.astype(x.dtype)
    # custom vjp for the backend-pathological gradient classes: strided
    # convs (lhs-dilated dx lowering) and tiny-fan-in convs (the dW
    # multiply-reduce lowering runs on the VPU at ~2 ms for the EBEN
    # discriminator's first convs — profiled round 2).  Opt-in: measured
    # composition-NEUTRAL per op but net-negative inside the fused GAN step
    # on this backend (ablate_step r2b/r2c), so the native lowering is the
    # default; flip with VIBRAVOX_CONV_CUSTOM=1 when a backend needs it.
    if _custom_vjp_enabled() and dilation == 1 and (stride > 1 or weight.shape[1] <= 8):
        return _conv1d_strided(x, weight, stride, pad, groups)
    return _conv1d_raw(x, weight, stride, pad, dilation, groups, precision)


def _custom_vjp_enabled() -> bool:
    import os

    return os.environ.get("VIBRAVOX_CONV_CUSTOM", "0") == "1"


def _conv1d_raw(x, weight, stride, pad, dilation, groups, precision=None):
    return lax.conv_general_dilated(
        x,
        weight,
        window_strides=(stride,),
        padding=[tuple(pad)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
        precision=precision,
    )


def polyphase_upsample_conv(
    x: jnp.ndarray,
    wf: jnp.ndarray,
    stride: int,
    lo: int,
    out_len: int,
    groups: int = 1,
) -> jnp.ndarray:
    """Correlation of an ``stride``-dilated input with ``wf``, as ONE dense conv.

    Computes ``y[n] = Σ_j xd[n - lo + j] · wf[j]`` for ``n < out_len``, where
    ``xd`` is ``x`` with ``stride - 1`` zeros inserted between samples —
    i.e. exactly ``lax.conv_general_dilated(..., lhs_dilation=(stride,),
    padding=[(lo, ·)])`` — but decomposed into its ``stride`` polyphase
    sub-kernels stacked on the output-channel axis of a single stride-1
    conv, followed by an interleaving reshape.  Dense MXU work instead of
    the backend's pathological zero-stuffed lowering; used for transposed
    convolutions and for the input gradient of strided convolutions.

    ``wf``: (k, cin//groups, cout) WIO, already in correlation orientation
    (i.e. flipped relative to a transposed-conv weight).
    """
    s = int(stride)
    if s == 1:
        k = wf.shape[0]
        pr = out_len + k - 1 - max(lo, 0) - x.shape[1]
        y = _conv1d_raw(x, wf, 1, (max(lo, 0), max(pr, 0)), 1, groups)
        if lo < 0:
            y = y[:, -lo:]
        return y[:, :out_len]
    k, cin_pg, cout = wf.shape
    copg = cout // groups
    l_in = x.shape[1]

    # phase p of the output reads x at offset off_p with sub-kernel wf[j0::s]
    sub_info = []
    for p in range(s):
        j0 = (lo - p) % s
        off_p = (p + j0 - lo) // s
        u_p = -(-(k - j0) // s)
        sub_info.append((j0, off_p, u_p))
    off_min = min(o for _, o, _ in sub_info)
    u_max = max(o - off_min + u for _, o, u in sub_info)

    # combined kernel: (U, cin_pg, groups, s, copg), group-major out channels
    wg = wf.reshape(k, cin_pg, groups, copg)
    wcat = jnp.zeros((u_max, cin_pg, groups, s, copg), wf.dtype)
    for p, (j0, off_p, u_p) in enumerate(sub_info):
        if u_p <= 0:
            continue
        shift = off_p - off_min
        wcat = wcat.at[shift : shift + u_p, :, :, p, :].set(wg[j0::s])
    rhs = wcat.reshape(u_max, cin_pg, groups * s * copg)

    q = -(-out_len // s)  # output rows per phase
    pl = -off_min
    if pl < 0:  # positive start offset: consume it by slicing the input
        x = x[:, -pl:]
        l_in = x.shape[1]
        pl = 0
    pr = q - 1 + u_max - l_in - pl
    y = _conv1d_raw(x, rhs, 1, (pl, max(pr, 0)), 1, groups)
    y = y[:, :q].reshape(x.shape[0], q, groups, s, copg)
    y = jnp.transpose(y, (0, 1, 3, 2, 4)).reshape(x.shape[0], q * s, groups * copg)
    return y[:, :out_len]


def _conv1d_strided_impl(x, weight, stride, pad, groups):
    return _conv1d_raw(x, weight, stride, pad, 1, groups)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _conv1d_strided(x, weight, stride, pad, groups):
    return _conv1d_strided_impl(x, weight, stride, pad, groups)


def _conv1d_strided_fwd(x, weight, stride, pad, groups):
    return _conv1d_strided_impl(x, weight, stride, pad, groups), (x, weight)


def _dw_slice_matmuls(x, g, k, stride, pad_left, groups, wdtype):
    """Kernel gradient as k strided-slice MXU contractions.

    dW[k', i, o] = Σ_{b,q} xpad[b, s·q + k', i] · g[b, q, o] — one
    (B·Q, cin/g) ⊗ (B·Q, cout/g) contraction per tap per group, instead of
    XLA's VPU multiply-reduce (which this backend lowers pathologically for
    tiny cin/g)."""
    b, t, cin = x.shape
    q, cout = g.shape[1], g.shape[2]
    cipg = cin // groups
    copg = cout // groups
    need = (q - 1) * stride + k
    xp = jnp.pad(x, [(0, 0), (pad_left, max(0, need - t - pad_left)), (0, 0)])
    gg = g.reshape(b, q, groups, copg)
    cols = []
    for kk in range(k):
        xs = jax.lax.slice(
            xp, (0, kk, 0), (b, kk + (q - 1) * stride + 1, cin), (1, stride, 1)
        ).reshape(b, q, groups, cipg)
        cols.append(
            jnp.einsum("bqgi,bqgo->gio", xs, gg,
                       preferred_element_type=jnp.float32)
        )
    dw = jnp.stack(cols)  # (k, groups, cipg, copg)
    return jnp.transpose(dw, (0, 2, 1, 3)).reshape(k, cipg, cout).astype(wdtype)


def _conv1d_strided_bwd(stride, pad, groups, res, g):
    x, weight = res
    k, cin_pg, cout = weight.shape
    copg = cout // groups
    # dx: correlation of the s-dilated cotangent with the io-swapped, flipped
    # kernel — the lhs-dilated gradient conv XLA would emit, re-expressed as
    # a dense polyphase conv
    wg = jnp.flip(weight, axis=0).reshape(k, cin_pg, groups, copg)
    wf_dx = jnp.transpose(wg, (0, 3, 2, 1)).reshape(k, copg, groups * cin_pg)
    dx = polyphase_upsample_conv(
        g, wf_dx, stride, k - 1 - pad[0], x.shape[1], groups
    ).astype(x.dtype)
    if cin_pg <= 8:
        dw = _dw_slice_matmuls(x, g, k, stride, pad[0], groups, weight.dtype)
    else:
        # dW through XLA autodiff: with enough input channels its
        # kernel-gradient lowering runs on the MXU and is fine
        _, w_vjp = jax.vjp(
            lambda ww: _conv1d_strided_impl(x, ww, stride, pad, groups), weight
        )
        (dw,) = w_vjp(g)
    return dx, dw


_conv1d_strided.defvjp(_conv1d_strided_fwd, _conv1d_strided_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def grouped_conv1d_spmd_safe(x, weight, pad, groups):
    """Stride-1 grouped conv whose vjp never hits XLA's grouped kernel-grad
    transpose.

    Under a multi-axis ``jax.sharding.Mesh`` with an unused (model) axis,
    GSPMD mis-reduces the ``feature_group_count`` kernel-gradient conv for
    some configurations — measured: the wav2vec2 positional conv (k=128,
    groups=16) gets its dW multiplied by the model-axis size on a
    ``(data, model)`` mesh (caught by ``tests/test_multidevice_equivalence``).
    This wrapper computes both cotangents with *primal-style* ops the
    partitioner handles correctly: dx as a forward grouped conv of the
    cotangent with the io-swapped flipped kernel, dW as per-tap sliced MXU
    contractions (``_dw_slice_matmuls``).
    """
    return _conv1d_raw(x, weight, 1, pad, 1, groups)


def _grouped_safe_fwd(x, weight, pad, groups):
    return grouped_conv1d_spmd_safe(x, weight, pad, groups), (x, weight)


def _grouped_safe_bwd(pad, groups, res, g):
    x, weight = res
    k, cin_pg, cout = weight.shape
    copg = cout // groups
    wg = jnp.flip(weight, axis=0).reshape(k, cin_pg, groups, copg)
    w_dx = jnp.transpose(wg, (0, 3, 2, 1)).reshape(k, copg, groups * cin_pg)
    dx = _conv1d_raw(
        g.astype(x.dtype), w_dx.astype(x.dtype), 1,
        (k - 1 - pad[0], k - 1 - pad[1]), 1, groups,
    )
    dw = _dw_slice_matmuls(x, g, k, 1, pad[0], groups, weight.dtype)
    return dx, dw


grouped_conv1d_spmd_safe.defvjp(_grouped_safe_fwd, _grouped_safe_bwd)


def grouped_conv1d_batched(x, weight, pad, groups):
    """Stride-1 grouped conv with the groups moved onto the BATCH axis.

    ``feature_group_count`` convs at small per-group widths are pathological
    on this backend when they stand alone (wav2vec2 pos-conv shapes, k=128
    g=16 d=768: 33.6 ms vs 0.10 ms for this formulation, outputs bitwise
    identical — round-4 ablation).  vmapping a dense conv over the group
    axis lowers to ONE conv with ``batch_group_count=groups``; the group
    split/merge transposes move ~2 MB and fuse.  Weight layout matches the
    grouped WIO convention: ``(k, cin/groups, cout)`` with output block
    ``g`` owned by group ``g``.
    """
    b, t, _ = x.shape
    k, cin_pg, cout = weight.shape
    copg = cout // groups
    xg = x.reshape(b, t, groups, cin_pg).transpose(2, 0, 1, 3)
    wg = weight.reshape(k, cin_pg, groups, copg).transpose(2, 0, 1, 3)
    out = jax.vmap(
        lambda xx, ww: lax.conv_general_dilated(
            xx, ww, (1,), [pad], dimension_numbers=("NWC", "WIO", "NWC")
        )
    )(xg, wg)
    return out.transpose(1, 2, 0, 3).reshape(b, -1, cout)


def conv_transpose1d(
    x: jnp.ndarray,
    weight_torch: jnp.ndarray,
    *,
    stride: int = 1,
    padding: int = 0,
    output_padding: int = 0,
    groups: int = 1,
    precision=None,
) -> jnp.ndarray:
    """1-D transposed convolution with exact ``torch.nn.ConvTranspose1d`` semantics.

    ``weight_torch`` uses the torch layout ``(in_channels, out_channels // groups,
    kernel)``.  Implemented as an input-dilated regular convolution (the standard
    equivalence), which XLA lowers to the MXU just like a forward conv:

        out_len = (in_len - 1) * stride - 2 * padding + kernel + output_padding
    """
    in_ch, out_ch_per_group, kernel = weight_torch.shape
    if in_ch % groups != 0:
        raise ValueError("in_channels must be divisible by groups")
    if weight_torch.dtype != x.dtype:
        weight_torch = weight_torch.astype(x.dtype)
    # (in, out//g, k) -> flip kernel, reorder to WIO with in/out swapped per group.
    # For grouped transpose conv the equivalent forward conv has
    # feature_group_count=groups and rhs (k, in//g, out), where the rhs for
    # output group g must come from input channels of group g.
    w = jnp.flip(weight_torch, axis=-1)  # (in, out//g, k)
    w = jnp.transpose(w, (2, 0, 1))  # (k, in, out//g)
    if groups == 1:
        rhs = w  # (k, in, out)
    else:
        in_per_group = in_ch // groups
        w = w.reshape(kernel, groups, in_per_group, out_ch_per_group)
        # forward-conv rhs: (k, in_per_group, groups * out_per_group) with the
        # group-major output channel order torch uses.
        rhs = jnp.transpose(w, (0, 2, 1, 3)).reshape(
            kernel, in_per_group, groups * out_ch_per_group
        )
    lo = kernel - 1 - padding
    out_len = (x.shape[1] - 1) * stride - 2 * padding + kernel + output_padding
    if _custom_vjp_enabled():
        # dense polyphase decomposition instead of lhs_dilation=(stride,) —
        # opt-in alongside the conv custom vjp (see conv1d)
        return polyphase_upsample_conv(x, rhs, stride, lo, out_len, groups)
    hi = lo + output_padding
    return lax.conv_general_dilated(
        x,
        rhs,
        window_strides=(1,),
        padding=[(lo, hi)],
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
        precision=precision,
    )


def torch_conv_weight_to_wio(w: jnp.ndarray) -> jnp.ndarray:
    """(out, in//groups, k) torch Conv1d weight -> (k, in//groups, out)."""
    return jnp.transpose(w, (2, 1, 0))


def wio_to_torch_conv_weight(w: jnp.ndarray) -> jnp.ndarray:
    """(k, in//groups, out) -> torch (out, in//groups, k)."""
    return jnp.transpose(w, (2, 1, 0))
