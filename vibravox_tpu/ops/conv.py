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

from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

PaddingSpec = Union[str, int, Tuple[int, int]]

__all__ = [
    "reflect_pad",
    "conv1d",
    "conv_transpose1d",
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
    return lax.conv_general_dilated(
        x,
        weight,
        window_strides=(stride,),
        padding=[pad],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
        precision=precision,
    )


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
    hi = kernel - 1 - padding + output_padding
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
