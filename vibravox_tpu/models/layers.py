"""Conv layers with explicit weight-norm parametrization (flax linen).

The reference wraps every GAN conv in torch ``weight_norm``
(``vibravox/torch_modules/utils.py:4-9``).  Here the parametrization is
explicit: the modules store a direction tensor ``kernel_v`` and per-channel
gains ``kernel_g`` and normalize inside ``__call__`` — keeping the
checkpoint-conversion path to/from the reference's ``weight.original0/1``
tensors trivial.

Weight-norm axis conventions follow torch ``weight_norm(dim=0)``:
  * Conv1d: torch weight is (out, in/groups, k) → gain per *output* channel.
    We store ``kernel_v`` in WIO ``(k, in/groups, out)``; norm over axes (0,1).
  * ConvTranspose1d: torch weight is (in, out/groups, k) → gain per *input*
    channel.  We store ``kernel_v`` in the torch layout; norm over axes (1,2).

Initialisation mirrors torch's conv default (kaiming-uniform a=√5 ⇒
U(±1/√fan_in)) so training dynamics match the reference GAN recipe.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

from vibravox_tpu.ops.conv import conv1d, conv_transpose1d

__all__ = ["WNConv1d", "WNConvTranspose1d", "WNKernel", "TorchConv1d", "leaky_relu"]


def leaky_relu(x: jnp.ndarray, negative_slope: float = 0.01) -> jnp.ndarray:
    return nn.leaky_relu(x, negative_slope=negative_slope)


def _torch_conv_init(fan_in: int):
    bound = 1.0 / (fan_in**0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


class TorchConv1d(nn.Module):
    """Plain Conv1d with torch-default init and reflect/zero padding (NWC)."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: Union[str, int, Tuple[int, int]] = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    pad_mode: str = "zeros"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        fan_in = (in_ch // self.groups) * self.kernel_size
        kernel = self.param(
            "kernel",
            _torch_conv_init(fan_in),
            (self.kernel_size, in_ch // self.groups, self.features),
        )
        y = conv1d(
            x,
            kernel,
            stride=self.stride,
            padding=self.padding,
            dilation=self.dilation,
            groups=self.groups,
            pad_mode=self.pad_mode,
        )
        if self.use_bias:
            bias = self.param("bias", _torch_conv_init(fan_in), (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class WNConv1d(nn.Module):
    """Weight-normalized Conv1d (NWC), torch ``weight_norm`` semantics."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: Union[str, int, Tuple[int, int]] = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    pad_mode: str = "zeros"
    eps: float = 0.0
    # int8 forward conv with straight-through backward (ops/quant.py) — the
    # int8-discriminator experiment; set by the disc modules from
    # VIBRAVOX_INT8_DISC
    int8: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, kernel_only: bool = False):
        in_ch = x.shape[-1]
        fan_in = (in_ch // self.groups) * self.kernel_size
        v = self.param(
            "kernel_v",
            _torch_conv_init(fan_in),
            (self.kernel_size, in_ch // self.groups, self.features),
        )

        def g_init(key, shape, dtype=jnp.float32):
            # g is initialized to ||v|| so the effective kernel equals v at init
            return jnp.sqrt(jnp.sum(jax.lax.stop_gradient(v) ** 2, axis=(0, 1)))

        g = self.param("kernel_g", g_init, (self.features,))
        norm = jnp.sqrt(jnp.sum(v**2, axis=(0, 1), keepdims=True))
        kernel = v * (g[None, None, :] / (norm + self.eps))
        if kernel_only:
            # effective (kernel, bias) for packed paths (ops/packed_melgan);
            # declares the identical param tree without running the conv
            bias = (
                self.param("bias", _torch_conv_init(fan_in), (self.features,))
                if self.use_bias else None
            )
            return kernel, bias
        if self.int8:
            from vibravox_tpu.ops.conv import _norm_padding
            from vibravox_tpu.ops.quant import conv1d_int8_ste

            pad = _norm_padding(self.padding, self.kernel_size, self.dilation)
            xx = x
            if self.pad_mode == "reflect" and pad != (0, 0):
                from vibravox_tpu.ops.conv import reflect_pad

                xx = reflect_pad(x, pad)
                pad = (0, 0)
            y = conv1d_int8_ste(
                xx, kernel.astype(xx.dtype), self.stride, tuple(pad),
                self.dilation, self.groups,
            )
        else:
            y = conv1d(
                x,
                kernel,
                stride=self.stride,
                padding=self.padding,
                dilation=self.dilation,
                groups=self.groups,
                pad_mode=self.pad_mode,
            )
        if self.use_bias:
            bias = self.param("bias", _torch_conv_init(fan_in), (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class WNKernel(nn.Module):
    """Creates WNConv1d's ``(kernel_v, kernel_g)`` params — same names, same
    init, same normalization — and returns the *effective* kernel without
    running the conv.  Lets fused kernels (``ops/fused_residual.py``) consume
    the weights while the param tree stays checkpoint-identical to WNConv1d.
    Ungrouped, biasless (the ResidualUnit configuration)."""

    features: int
    kernel_size: int
    in_features: int
    eps: float = 0.0

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        fan_in = self.in_features * self.kernel_size
        v = self.param(
            "kernel_v",
            _torch_conv_init(fan_in),
            (self.kernel_size, self.in_features, self.features),
        )

        def g_init(key, shape, dtype=jnp.float32):
            return jnp.sqrt(jnp.sum(jax.lax.stop_gradient(v) ** 2, axis=(0, 1)))

        g = self.param("kernel_g", g_init, (self.features,))
        norm = jnp.sqrt(jnp.sum(v**2, axis=(0, 1), keepdims=True))
        return v * (g[None, None, :] / (norm + self.eps))


class WNConvTranspose1d(nn.Module):
    """Weight-normalized ConvTranspose1d with torch semantics (NWC).

    ``kernel_v`` is stored in the torch layout (in, out/groups, k); the gain
    is per input channel (torch ``weight_norm(dim=0)`` on transpose convs).
    """

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    output_padding: int = 0
    groups: int = 1
    use_bias: bool = True
    eps: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        # torch ConvTranspose1d init: fan_in = (out/groups) * k of the
        # *transposed* view — torch uses weight.size(1) * k = out/groups * k
        fan_in = (self.features // self.groups) * self.kernel_size
        v = self.param(
            "kernel_v",
            _torch_conv_init(fan_in),
            (in_ch, self.features // self.groups, self.kernel_size),
        )

        def g_init(key, shape, dtype=jnp.float32):
            return jnp.sqrt(jnp.sum(jax.lax.stop_gradient(v) ** 2, axis=(1, 2)))

        g = self.param("kernel_g", g_init, (in_ch,))
        norm = jnp.sqrt(jnp.sum(v**2, axis=(1, 2), keepdims=True))
        kernel = v * (g[:, None, None] / (norm + self.eps))
        y = conv_transpose1d(
            x,
            kernel,
            stride=self.stride,
            padding=self.padding,
            output_padding=self.output_padding,
            groups=self.groups,
        )
        if self.use_bias:
            bias = self.param("bias", _torch_conv_init(fan_in), (self.features,))
            y = y + bias.astype(y.dtype)
        return y
