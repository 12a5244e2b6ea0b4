"""EBEN generator (flax linen, channels-last).

TPU-native reimplementation of the reference architecture
(``vibravox/torch_modules/dnn/eben_generator.py:89-316``): PQMF analysis of
the first ``p`` bands, a 1-D conv U-Net (3 enc blocks with strides 2/4/8, a
256→64→256 latent bottleneck, 3 skip-connected dec blocks), a plain last
conv to ``m`` bands, then ``tanh(x + [first_bands ‖ 0])`` and fused PQMF
synthesis+band-sum.

The forward is split into ``front`` (analysis → features before the last
conv) and ``tail`` (last conv → tanh → synthesis) so the training step can
take per-atomic-loss gradients w.r.t. the last conv kernel (the reference's
dynamic loss balancing anchor — ``eben.py:222-240``) without re-traversing
the encoder/decoder.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from vibravox_tpu.models.layers import TorchConv1d, WNConv1d, WNConvTranspose1d, WNKernel
from vibravox_tpu.ops.conv import conv1d
from vibravox_tpu.ops.fused_residual import residual_stack
from vibravox_tpu.ops.pqmf import PQMF

__all__ = ["EBENGenerator", "EncBlock", "DecBlock", "ResidualUnit"]

_LEAKY_SLOPE = 0.01


def _nl(x: jnp.ndarray) -> jnp.ndarray:
    return nn.leaky_relu(x, negative_slope=_LEAKY_SLOPE)


class ResidualUnit(nn.Module):
    """Dilated conv + pointwise conv with residual add (ref ``eben_generator.py:287-316``).

    Param tree matches the WNConv1d-based original exactly; ``kernels_only``
    returns the effective (weight-normalized) kernels so the enclosing block
    can run the whole 3-unit stack through the fused Pallas kernel
    (``ops/fused_residual.py``) instead of six separate convs."""

    channels: int
    dilation: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, kernels_only: bool = False):
        kd = WNKernel(self.channels, 3, x.shape[-1], name="dilated_conv")()
        kp = WNKernel(self.channels, 1, self.channels, name="pointwise_conv")()
        if kernels_only:
            return kd, kp
        h = conv1d(x, kd, padding="same", dilation=self.dilation, pad_mode="reflect")
        h = conv1d(h, kp, padding="same", pad_mode="reflect")
        return x + _nl(h)


def _residual_stack(x: jnp.ndarray, channels: int) -> jnp.ndarray:
    """3 dilated ResidualUnits (1, 3, 9), fused when the backend supports it.

    Must be called from within a block's compact ``__call__`` — the
    ResidualUnit submodules attach to the calling scope, keeping the param
    tree identical to the per-unit formulation."""
    kernels = tuple(
        ResidualUnit(channels, d, name=f"residual_{i}")(x, kernels_only=True)
        for i, d in enumerate((1, 3, 9))
    )
    return residual_stack(x, kernels, (1, 3, 9), _LEAKY_SLOPE)


class EncBlock(nn.Module):
    """3 residual units then a strided downsampling conv (ref ``257-284``)."""

    out_channels: int
    stride: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = _residual_stack(x, self.out_channels // 2)
        return WNConv1d(
            self.out_channels,
            2 * self.stride,
            stride=self.stride,
            padding=self.stride - 1,
            use_bias=False,
            pad_mode="reflect",
            name="conv",
        )(x)


class DecBlock(nn.Module):
    """Skip-add, transposed upsampling conv, then 3 residual units (ref ``225-254``)."""

    out_channels: int
    stride: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, encoder_output: jnp.ndarray) -> jnp.ndarray:
        x = x + encoder_output
        x = WNConvTranspose1d(
            self.out_channels,
            2 * self.stride,
            stride=self.stride,
            padding=self.stride // 2,
            output_padding=0,
            use_bias=False,
            name="conv_trans",
        )(x)
        x = _nl(x)
        return _residual_stack(x, self.out_channels)


class EBENGenerator(nn.Module):
    """EBEN generator.

    Args:
        m: number of PQMF bands (= decimation factor).
        n: PQMF kernel size.
        p: number of informative low bands fed to the U-Net.
    """

    m: int = 4
    n: int = 32
    p: int = 2

    @property
    def multiple(self) -> int:
        # product of encoder strides and PQMF decimation (ref ``eben_generator.py:108``)
        return 2 * 4 * 8 * self.m

    @property
    def pqmf(self) -> PQMF:
        return PQMF(decimation=self.m, kernel_size=self.n)

    def valid_length(self, length: int) -> int:
        """Largest valid input length ≤ ``length`` (ref ``cut_to_valid_length``)."""
        return length - (length + self.n) % self.multiple

    def cut_to_valid_length(self, audio: jnp.ndarray) -> jnp.ndarray:
        """Trim NWC audio (B, T, 1) so every stride divides evenly."""
        return audio[:, : self.valid_length(audio.shape[1]), :]

    # ------------------------------------------------------------------ #

    def setup(self):
        self.first_conv = TorchConv1d(
            32, 3, padding="same", use_bias=False, pad_mode="reflect", name="first_conv"
        )
        self.enc_0 = EncBlock(64, 2, name="enc_0")
        self.enc_1 = EncBlock(128, 4, name="enc_1")
        self.enc_2 = EncBlock(256, 8, name="enc_2")
        self.latent_conv_0 = WNConv1d(
            64, 7, padding="same", use_bias=False, pad_mode="reflect", name="latent_conv_0"
        )
        self.latent_conv_1 = WNConv1d(
            256, 7, padding="same", use_bias=False, pad_mode="reflect", name="latent_conv_1"
        )
        self.dec_0 = DecBlock(128, 8, name="dec_0")
        self.dec_1 = DecBlock(64, 4, name="dec_1")
        self.dec_2 = DecBlock(32, 2, name="dec_2")
        self.last_conv = TorchConv1d(
            self.m, 3, padding="same", use_bias=False, pad_mode="reflect", name="last_conv"
        )

    def __call__(self, cut_audio: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """cut_audio (B, T, 1) -> (enhanced (B, T, 1), decomposed (B, T', m))."""
        features, first_bands = self.front(cut_audio)
        return self.tail(features, first_bands)

    def front(self, cut_audio: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """PQMF analysis + U-Net up to (but excluding) the last conv."""
        first_bands = self.pqmf.analysis(cut_audio, bands=self.p)  # (B, T', p)

        x = self.first_conv(first_bands)
        x1 = self.enc_0(_nl(x))
        x2 = self.enc_1(_nl(x1))
        x3 = self.enc_2(_nl(x2))

        h = _nl(x3)
        h = _nl(self.latent_conv_0(h))
        h = _nl(self.latent_conv_1(h))

        d = self.dec_0(h, x3)
        d = self.dec_1(d, x2)
        d = self.dec_2(d, x1)
        return d, first_bands

    def tail(
        self, features: jnp.ndarray, first_bands: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Last conv → tanh(x + [first_bands ‖ 0]) → fused PQMF synthesis."""
        x = self.last_conv(features)
        b, t, _ = first_bands.shape
        fill = jnp.zeros((b, t, self.m - self.p), dtype=first_bands.dtype)
        decomposed = jnp.tanh(x + jnp.concatenate([first_bands, fill], axis=-1))
        enhanced = self.pqmf.synthesis(decomposed)
        return enhanced, decomposed
