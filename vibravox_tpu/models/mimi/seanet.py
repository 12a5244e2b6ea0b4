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

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from vibravox_tpu.ops.conv import conv1d, conv_transpose1d
from vibravox_tpu.ops.packed_seanet import (
    packed_decoder_tail,
    packed_encoder_stem,
    stem_packable,
    tail_packable,
)

__all__ = ["SEANetEncoder", "SEANetDecoder"]


def _elu(x: jnp.ndarray) -> jnp.ndarray:
    return nn.elu(x)


class CausalConv(nn.Module):
    """Causal 1-D conv with EnCodec/Mimi padding semantics: ``padding_total
    = k_eff - stride`` on the left plus the extra right padding that
    completes the last frame (HF ``MimiConv1d._get_extra_padding_for_conv1d``),
    so converted checkpoint weights reproduce outputs sample-for-sample."""

    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    pad_mode: str = "zeros"  # "zeros" | "replicate" (HF downsample uses edge)
    # conv compute dtype ("bfloat16" on TPU); params stay f32 masters
    compute_dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, kernel_only: bool = False):
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, in_ch // self.groups, self.features),
        )
        if kernel_only:
            # raw (kernel, bias) for the packed-stem path (ops/packed_seanet);
            # declares the identical param tree without running the conv
            bias = (
                self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None
            )
            return kernel, bias
        if self.compute_dtype:
            dt = jnp.dtype(self.compute_dtype)
            x = x.astype(dt)
            kernel = kernel.astype(dt)
        k_eff = (self.kernel_size - 1) * self.dilation + 1
        pad_total = k_eff - self.stride
        length = x.shape[1]
        # frames = ceil((L - k_eff + pad_total)/stride + 1) - 1, then pad the
        # tail so the last frame is complete (HF MimiConv1d semantics)
        frames = -(-(length - k_eff + pad_total) // self.stride)
        ideal = frames * self.stride + k_eff - pad_total
        extra = max(0, ideal - length)
        if self.pad_mode == "replicate":
            x = jnp.pad(x, ((0, 0), (pad_total, extra), (0, 0)), mode="edge")
            pad_total = extra = 0
        y = conv1d(
            x, kernel, stride=self.stride, dilation=self.dilation,
            groups=self.groups, padding=(pad_total, extra),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class CausalConvTranspose(nn.Module):
    features: int
    kernel_size: int
    stride: int = 1
    groups: int = 1
    use_bias: bool = True
    compute_dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, kernel_only: bool = False):
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (in_ch, self.features // self.groups, self.kernel_size),  # torch layout
        )
        if kernel_only:
            bias = (
                self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None
            )
            return kernel, bias
        if self.compute_dtype:
            dt = jnp.dtype(self.compute_dtype)
            x = x.astype(dt)
            kernel = kernel.astype(dt)
        y = conv_transpose1d(x, kernel, stride=self.stride, padding=0, groups=self.groups)
        # causal trim: remove the transposed conv's right-side overhang
        # (HF trim_right_ratio=1.0: all of padding_total off the right)
        trim = self.kernel_size - self.stride
        if trim > 0:
            y = y[:, :-trim, :]
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class SEANetResnetBlock(nn.Module):
    dim: int
    compress: int = 2
    dilation: int = 1
    kernel_size: int = 3
    compute_dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, kernels_only: bool = False):
        hidden = self.dim // self.compress
        conv_0 = CausalConv(hidden, self.kernel_size, dilation=self.dilation,
                            compute_dtype=self.compute_dtype, name="conv_0")
        conv_1 = CausalConv(self.dim, 1, compute_dtype=self.compute_dtype,
                            name="conv_1")
        if kernels_only:
            # (kernel, bias) pairs for ops/packed_seanet; dummies carry only
            # the channel counts the convs read their in_ch from
            return (
                conv_0(jnp.zeros((1, 1, self.dim)), kernel_only=True),
                conv_1(jnp.zeros((1, 1, hidden)), kernel_only=True),
            )
        h = _elu(x)
        h = conv_0(h)
        h = _elu(h)
        h = conv_1(h)
        return x + h.astype(x.dtype)


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
    compute_dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        mult = 1
        cdt = self.compute_dtype
        ratios_rev = tuple(reversed(tuple(self.ratios)))
        p = ratios_rev[0] if ratios_rev else 0
        start = 0
        if stem_packable(x.shape[1], x.shape[-1], self.n_filters, p):
            # full-rate segment (conv_in, first-stage residual blocks,
            # down_0) in the space-to-depth packed domain — identical param
            # tree, identical math (ops/packed_seanet.py)
            conv_in = CausalConv(self.n_filters, self.kernel_size,
                                 compute_dtype=cdt, name="conv_in")
            dilations = [self.dilation_base**j
                         for j in range(self.n_residual_layers)]
            blocks = [
                SEANetResnetBlock(
                    self.n_filters, self.compress, dilation=d,
                    kernel_size=self.residual_kernel_size, compute_dtype=cdt,
                    name=f"block_0_res_{j}",
                )(x, kernels_only=True)
                for j, d in enumerate(dilations)
            ]
            down_0 = CausalConv(self.n_filters * 2, p * 2, stride=p,
                                compute_dtype=cdt, name="down_0")
            h = packed_encoder_stem(
                x,
                conv_in(x, kernel_only=True),
                blocks,
                down_0(jnp.zeros((1, 1, self.n_filters)), kernel_only=True),
                p=p, dilations=dilations, compute_dtype=cdt,
            )
            mult = 2
            start = 1
        else:
            h = CausalConv(self.n_filters, self.kernel_size, compute_dtype=cdt,
                           name="conv_in")(x)
        # downsample with the smallest ratio first (EnCodec ordering)
        for i, ratio in enumerate(ratios_rev):
            if i < start:
                continue
            for j in range(self.n_residual_layers):
                h = SEANetResnetBlock(
                    mult * self.n_filters, self.compress,
                    dilation=self.dilation_base**j,
                    kernel_size=self.residual_kernel_size,
                    compute_dtype=cdt,
                    name=f"block_{i}_res_{j}",
                )(h)
            h = _elu(h)
            h = CausalConv(
                mult * self.n_filters * 2, ratio * 2, stride=ratio,
                compute_dtype=cdt, name=f"down_{i}",
            )(h)
            mult *= 2
        h = _elu(h)
        return CausalConv(self.dimension, self.last_kernel_size, compute_dtype=cdt,
                          name="conv_out")(h)


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
    compute_dtype: Optional[str] = None

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        ratios = tuple(self.ratios)
        mult = 2 ** len(ratios)
        cdt = self.compute_dtype
        p = ratios[-1] if ratios else 0
        packed_tail = tail_packable(self.n_filters, p)
        last = len(ratios) - 1
        h = CausalConv(mult * self.n_filters, self.kernel_size, compute_dtype=cdt,
                       name="conv_in")(z)
        for i, ratio in enumerate(ratios):
            h = _elu(h)
            up = CausalConvTranspose(
                mult * self.n_filters // 2, ratio * 2, stride=ratio,
                compute_dtype=cdt, name=f"up_{i}",
            )
            dilations = [self.dilation_base**j
                         for j in range(self.n_residual_layers)]
            blocks = [
                SEANetResnetBlock(
                    mult * self.n_filters // 2, self.compress, dilation=d,
                    kernel_size=self.residual_kernel_size, compute_dtype=cdt,
                    name=f"block_{i}_res_{j}",
                )
                for j, d in enumerate(dilations)
            ]
            if packed_tail and i == last:
                # full-rate tail (up_last, residual blocks, ELU, conv_out)
                # in the packed domain — identical param tree and math
                conv_out = CausalConv(1, self.last_kernel_size, name="conv_out")
                return packed_decoder_tail(
                    h,
                    up(h, kernel_only=True),
                    [blk(h, kernels_only=True) for blk in blocks],
                    conv_out(jnp.zeros((1, 1, self.n_filters)), kernel_only=True),
                    p=p, dilations=dilations, compute_dtype=cdt,
                )
            h = up(h)
            for blk in blocks:
                h = blk(h)
            mult //= 2
        h = _elu(h)
        # final conv back to f32 so the waveform output is full precision
        h = CausalConv(1, self.last_kernel_size, name="conv_out")(h.astype(jnp.float32))
        return h
