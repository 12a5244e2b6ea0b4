"""Dynamic int8 quantized 1-D convolution with a straight-through backward.

Probe op for the int8-discriminator experiment (docs/PERF.md lever table):
the EBEN/MelGAN discriminators' forward conv stacks are re-expressed as
int8 x int8 -> int32 convolutions — the v5e MXU runs int8 at 2x its bf16
peak (394 TOPS), so IF XLA lowers integer convs onto the MXU on this
backend, the disc forward passes (adversarial + feature-matching + real/
fake scoring) get cheaper.  The backward is straight-through: gradients
flow through the UNQUANTIZED conv (computed from the saved f32/bf16
operands), so the experiment perturbs only forward activations (one
round-trip of quantization noise per conv), not the gradient path — the
standard QAT fake-quant semantics, except the forward genuinely runs in
int8 instead of simulating it.

Scales are dynamic and symmetric: per-tensor for the activation, per-
output-channel for the weight (both computed from the live max-abs, no
calibration state).  There is no train/eval asymmetry to manage.

Reference has no analog (pure f32 torch discriminators,
``vibravox/torch_modules/dnn/eben_discriminator.py``); this is a
TPU-hardware lever.  Gated by ``VIBRAVOX_INT8_DISC=1`` in the
discriminator modules; exactness vs the plain conv is bounded by
quantization error, pinned in ``tests/test_eben_models.py``.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from vibravox_tpu.ops.conv import _conv1d_raw

__all__ = ["conv1d_int8_ste", "quantize_symmetric"]


def quantize_symmetric(x: jnp.ndarray, axes: Tuple[int, ...]):
    """Symmetric int8 quantization; returns (q, scale) with x ~= q * scale.

    ``axes`` are the reduction axes of the max-abs (the remaining axes keep
    their own scale).  The scale is clamped away from zero so an all-zero
    tensor quantizes to zeros instead of NaNs.
    """
    # initial=0: zero-size inputs (e.g. a dilated disc stage fed a short
    # tier-1 test signal) quantize to empty int8 instead of erroring like
    # an identityless max would
    amax = jnp.max(
        jnp.abs(x.astype(jnp.float32)), axis=axes, keepdims=True, initial=0.0
    )
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _int8_conv_fwd_impl(x, weight, stride, pad, dilation, groups):
    qx, sx = quantize_symmetric(x, axes=(0, 1, 2))        # per-tensor
    qw, sw = quantize_symmetric(weight, axes=(0, 1))      # per-out-channel
    y = lax.conv_general_dilated(
        qx,
        qw,
        window_strides=(stride,),
        padding=[tuple(pad)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.int32,
    )
    # sx is scalar-shaped (1,1,1); sw is (1,1,out) -> broadcast over (B,T,out)
    return (y.astype(jnp.float32) * (sx * sw)).astype(x.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def conv1d_int8_ste(x, weight, stride, pad, dilation, groups):
    """int8 forward conv, straight-through (unquantized-conv) backward.

    ``pad`` is an explicit (lo, hi) tuple — normalize paddings before
    calling (the WNConv1d call sites already do).
    """
    return _int8_conv_fwd_impl(x, weight, stride, pad, dilation, groups)


def _ste_fwd(x, weight, stride, pad, dilation, groups):
    return _int8_conv_fwd_impl(x, weight, stride, pad, dilation, groups), (x, weight)


def _ste_bwd(stride, pad, dilation, groups, res, g):
    x, weight = res
    _, vjp = jax.vjp(
        lambda x_, w_: _conv1d_raw(x_, w_, stride, pad, dilation, groups), x, weight
    )
    return vjp(g)


conv1d_int8_ste.defvjp(_ste_fwd, _ste_bwd)
