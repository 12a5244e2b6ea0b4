"""SEANet convolutional encoder/decoder (flax linen, channels-last).

The reference *loads* the Mimi codec through ``moshi.models.loaders``
(``lightning_modules/regressive_mimi.py:24-30``) and never implements it;
this framework implements the architecture natively.  SEANet (Tagliasacchi
et al. 2020, as used by EnCodec/Mimi): a conv stem, N downsampling blocks
(residual units + strided conv, ELU activations), and a mirrored decoder
with transposed convs.  Causal padding throughout, matching the streaming
Mimi configuration.

Defaults follow the published Mimi v0.1 hyperparameters (n_filters 64,
ratios 8/6/5/4, dimension 512, kernel 7, residual kernel 3, compress 2).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from vibravox_tpu.ops.conv import conv1d, conv_transpose1d

__all__ = ["SEANetEncoder", "SEANetDecoder"]


def _elu(x: jnp.ndarray) -> jnp.ndarray:
    return nn.elu(x)


class CausalConv(nn.Module):
    """Causal (left-padded) 1-D conv with torch-layout-convertible weights."""

    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, in_ch, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        pad_total = (self.kernel_size - 1) * self.dilation
        # causal: all padding on the left; with stride, keep the
        # EnCodec/Mimi convention of padding extra to cover the last frame
        extra = (x.shape[1] - self.kernel_size) % self.stride if self.stride > 1 else 0
        y = conv1d(
            x, kernel, stride=self.stride, dilation=self.dilation,
            padding=(pad_total, (self.stride - extra) % self.stride if self.stride > 1 else 0),
        )
        return y + bias.astype(y.dtype)


class CausalConvTranspose(nn.Module):
    features: int
    kernel_size: int
    stride: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (in_ch, self.features, self.kernel_size),  # torch layout
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        y = conv_transpose1d(x, kernel, stride=self.stride, padding=0)
        # causal trim: remove the transposed conv's right-side overhang
        trim = self.kernel_size - self.stride
        if trim > 0:
            y = y[:, :-trim, :]
        return y + bias.astype(y.dtype)


class SEANetResnetBlock(nn.Module):
    dim: int
    compress: int = 2
    dilation: int = 1
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        hidden = self.dim // self.compress
        h = _elu(x)
        h = CausalConv(hidden, self.kernel_size, dilation=self.dilation, name="conv_0")(h)
        h = _elu(h)
        h = CausalConv(self.dim, 1, name="conv_1")(h)
        return x + h


class SEANetEncoder(nn.Module):
    """waveform (B, T, 1) -> latent (B, T / prod(ratios), dimension)."""

    dimension: int = 512
    n_filters: int = 64
    ratios: Sequence[int] = (8, 6, 5, 4)
    kernel_size: int = 7
    last_kernel_size: int = 3
    residual_kernel_size: int = 3
    n_residual_layers: int = 1
    compress: int = 2
    dilation_base: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        mult = 1
        h = CausalConv(self.n_filters, self.kernel_size, name="conv_in")(x)
        # downsample with the smallest ratio first (EnCodec ordering)
        for i, ratio in enumerate(reversed(tuple(self.ratios))):
            for j in range(self.n_residual_layers):
                h = SEANetResnetBlock(
                    mult * self.n_filters, self.compress,
                    dilation=self.dilation_base**j,
                    kernel_size=self.residual_kernel_size,
                    name=f"block_{i}_res_{j}",
                )(h)
            h = _elu(h)
            h = CausalConv(
                mult * self.n_filters * 2, ratio * 2, stride=ratio,
                name=f"down_{i}",
            )(h)
            mult *= 2
        h = _elu(h)
        return CausalConv(self.dimension, self.last_kernel_size, name="conv_out")(h)


class SEANetDecoder(nn.Module):
    """latent (B, T', dimension) -> waveform (B, T' * prod(ratios), 1)."""

    dimension: int = 512
    n_filters: int = 64
    ratios: Sequence[int] = (8, 6, 5, 4)
    kernel_size: int = 7
    last_kernel_size: int = 3
    residual_kernel_size: int = 3
    n_residual_layers: int = 1
    compress: int = 2
    dilation_base: int = 2

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        mult = 2 ** len(tuple(self.ratios))
        h = CausalConv(mult * self.n_filters, self.kernel_size, name="conv_in")(z)
        for i, ratio in enumerate(tuple(self.ratios)):
            h = _elu(h)
            h = CausalConvTranspose(
                mult * self.n_filters // 2, ratio * 2, stride=ratio,
                name=f"up_{i}",
            )(h)
            for j in range(self.n_residual_layers):
                h = SEANetResnetBlock(
                    mult * self.n_filters // 2, self.compress,
                    dilation=self.dilation_base**j,
                    kernel_size=self.residual_kernel_size,
                    name=f"block_{i}_res_{j}",
                )(h)
            mult //= 2
        h = _elu(h)
        return CausalConv(1, self.last_kernel_size, name="conv_out")(h)
