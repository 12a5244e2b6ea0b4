"""MelGAN discriminator stack (flax linen, channels-last).

Reimplementation of the reference modules
(``vibravox/torch_modules/dnn/melgan_discriminator.py:17-169``): a 7-stage
weight-norm conv stack over raw waveforms, and a multi-scale wrapper whose
downsamplers are Kaiser-sinc polyphase resamplers (replacing torchaudio
``Resample``) — implemented as differentiable strided convs so gradients
flow through every scale.

Each discriminator returns the list of per-layer activations
(input included, certainties last) for the feature-matching loss.
"""

from __future__ import annotations

from typing import List

import flax.linen as nn
import jax.numpy as jnp

from vibravox_tpu.models.layers import WNConv1d
from vibravox_tpu.ops.conv import reflect_pad
from vibravox_tpu.ops.packed_melgan import disc_stem_packable, packed_disc_stem
from vibravox_tpu.ops.resample import KaiserResampler

__all__ = ["DiscriminatorMelGAN", "MelganMultiScalesDiscriminator"]


class DiscriminatorMelGAN(nn.Module):
    """Single-scale MelGAN discriminator (ref ``melgan_discriminator.py:76-169``)."""

    alpha_leaky_relu: float = 0.2

    def setup(self):
        import os

        # int8-discriminator experiment (ops/quant.py; see eben_discriminator):
        # when the packed stem is active it covers conv_0..conv_2, so int8
        # engages from conv_3 on — still the FLOP bulk (1024-ch k41 stacks)
        int8 = os.environ.get("VIBRAVOX_INT8_DISC", "0") == "1"
        self.stages = [
            WNConv1d(16, 15, stride=1, name="conv_0"),
            WNConv1d(64, 41, stride=4, padding=20, groups=4, int8=int8, name="conv_1"),
            WNConv1d(256, 41, stride=4, padding=20, groups=4, int8=int8, name="conv_2"),
            WNConv1d(1024, 41, stride=4, padding=20, groups=4, int8=int8, name="conv_3"),
            WNConv1d(1024, 41, stride=4, padding=20, groups=4, int8=int8, name="conv_4"),
            WNConv1d(1024, 5, stride=1, padding=2, int8=int8, name="conv_5"),
        ]
        self.certainty_conv = WNConv1d(1, 3, stride=1, padding=1, name="conv_6")

    def __call__(self, audio: jnp.ndarray) -> List[jnp.ndarray]:
        """audio (B, T, 1) -> list of 8 embeddings [input, 6 hidden, certainties]."""
        embeddings = [audio]
        if disc_stem_packable(audio.shape[1]):
            # full-rate stem (conv_0..conv_2) in the space-to-depth packed
            # domain (ops/packed_melgan.py) — identical param tree and math
            kbs = [
                self.stages[0](jnp.zeros((1, 1, 1)), kernel_only=True),
                self.stages[1](jnp.zeros((1, 1, 16)), kernel_only=True),
                self.stages[2](jnp.zeros((1, 1, 64)), kernel_only=True),
            ]
            packed = packed_disc_stem(
                audio, *kbs, groups=4, slope=self.alpha_leaky_relu)
            embeddings.extend(packed)
            x = packed[-1]
            rest = self.stages[len(packed):]
        else:
            x = reflect_pad(audio, (7, 7))
            rest = self.stages
        for stage in rest:
            x = stage(x)
            x = nn.leaky_relu(x, negative_slope=self.alpha_leaky_relu)
            embeddings.append(x)
        embeddings.append(self.certainty_conv(x))
        return embeddings


class MelganMultiScalesDiscriminator(nn.Module):
    """N discriminators fed by successively half-rate resampled audio
    (ref ``melgan_discriminator.py:17-73``)."""

    sample_rate: int
    scales: int = 3
    alpha_leaky_relu: float = 0.2

    def setup(self):
        self.discriminators = [
            DiscriminatorMelGAN(self.alpha_leaky_relu, name=f"disc_{s}")
            for s in range(self.scales)
        ]
        # frozen conv kernels, built once on the host; scale 0 is identity
        self._downsamplers = [
            KaiserResampler(self.sample_rate, self.sample_rate // (2**s))
            for s in range(self.scales)
        ]

    def get_downsampled_versions(self, audio: jnp.ndarray) -> List[jnp.ndarray]:
        return [down(audio) for down in self._downsamplers]

    def __call__(self, audio: jnp.ndarray) -> List[List[jnp.ndarray]]:
        """audio (B, T, 1) -> per-scale lists of per-layer embeddings."""
        return [
            disc(signal)
            for disc, signal in zip(self.discriminators, self.get_downsampled_versions(audio))
        ]
