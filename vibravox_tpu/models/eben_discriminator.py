"""EBEN multi-scale discriminators (flax linen, channels-last).

Reimplementation of ``vibravox/torch_modules/dnn/eben_discriminator.py``:
three grouped-conv PQMF-band discriminators at dilations 1/2/3 over the
*last q* PQMF bands, plus one full-scale MelGAN discriminator; returns the
nested list of every layer's activations for feature matching.
"""

from __future__ import annotations

from typing import List

import flax.linen as nn
import jax.numpy as jnp

from vibravox_tpu.models.layers import WNConv1d
from vibravox_tpu.models.melgan_discriminator import DiscriminatorMelGAN
from vibravox_tpu.ops.conv import reflect_pad

__all__ = ["DiscriminatorEBEN", "DiscriminatorEBENMultiScales"]


class DiscriminatorEBEN(nn.Module):
    """Grouped weight-norm conv stack over q PQMF bands
    (ref ``eben_discriminator.py:54-163``)."""

    dilation: int = 1
    q: int = 3
    min_channels: int = 24

    def setup(self):
        assert self.min_channels % self.q == 0, "min_channels must be a multiple of q"
        import os

        # int8-discriminator experiment (ops/quant.py): mid stages run their
        # forward conv in int8 (straight-through backward); the tiny in/out
        # stages stay in the compute dtype (nothing to win, precision-facing)
        int8 = os.environ.get("VIBRAVOX_INT8_DISC", "0") == "1"
        c, d, q = self.min_channels, self.dilation, self.q
        self.stage_0 = WNConv1d(c, 3, stride=1, padding=1, dilation=d, groups=q, name="conv_0")
        self.mid_stages = [
            WNConv1d(c * 2, 7, stride=2, padding=3, dilation=d, groups=q, int8=int8, name="conv_1"),
            WNConv1d(c * 4, 7, stride=2, padding=3, dilation=d, groups=q, int8=int8, name="conv_2"),
            WNConv1d(c * 8, 7, stride=2, padding=3, dilation=d, groups=q, int8=int8, name="conv_3"),
            WNConv1d(c * 16, 7, stride=2, padding=3, dilation=d, groups=q, int8=int8, name="conv_4"),
            WNConv1d(c * 32, 7, stride=2, padding=3, dilation=d, groups=q, int8=int8, name="conv_5"),
            WNConv1d(c * 32, 5, stride=1, padding=2, dilation=d, groups=q, int8=int8, name="conv_6"),
        ]
        self.certainty_conv = WNConv1d(1, 3, stride=1, padding=1, name="conv_7")

    def __call__(self, bands: jnp.ndarray) -> List[jnp.ndarray]:
        """bands (B, T', q) -> list of 9 embeddings [input, 7 hidden, certainties]."""
        embeddings = [bands]
        # stage 0: ReflectionPad1d(1) then zero-padded conv (ref ``68-79``)
        x = self.stage_0(reflect_pad(bands, (1, 1)))
        x = nn.leaky_relu(x, negative_slope=0.2)
        embeddings.append(x)
        for stage in self.mid_stages:
            x = nn.leaky_relu(stage(x), negative_slope=0.2)
            embeddings.append(x)
        embeddings.append(self.certainty_conv(x))
        return embeddings


class DiscriminatorEBENMultiScales(nn.Module):
    """3 band discriminators (dilation 1/2/3) + 1 full-scale MelGAN
    (ref ``eben_discriminator.py:10-51``)."""

    q: int = 3
    min_channels: int = 24

    def setup(self):
        self.pqmf_discriminators = [
            DiscriminatorEBEN(dilation=d, q=self.q, min_channels=self.min_channels,
                              name=f"pqmf_disc_{d}")
            for d in (1, 2, 3)
        ]
        self.melgan_discriminator = DiscriminatorMelGAN(0.2, name="melgan")

    def __call__(self, bands: jnp.ndarray, audio: jnp.ndarray) -> List[List[jnp.ndarray]]:
        """bands (B, T', M) all PQMF bands; audio (B, T, 1).

        Returns one embedding list per discriminator (band discriminators see
        only the last q bands — ref ``eben_discriminator.py:46-47``).
        """
        embeddings = [dis(bands[:, :, -self.q:]) for dis in self.pqmf_discriminators]
        embeddings.append(self.melgan_discriminator(audio))
        return embeddings
