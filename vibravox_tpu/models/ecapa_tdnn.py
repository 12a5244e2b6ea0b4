"""Speaker embedding network: ECAPA-TDNN (flax linen, channels-last).

The reference runs speaker verification through a *downloaded TorchScript*
ECAPA2 model (``ecapa2.py:38-40``) — a black box it never implements.  This
framework implements the speaker-embedding architecture natively: the
ECAPA-TDNN of Desplanques et al. 2020 (Res2Net TDNN blocks with
squeeze-excitation, multi-layer feature aggregation and channel-dependent
attentive statistics pooling), operating on jit-computed log-mel features.

The SPKV task consumes any embedder with the ``(B, T) waveform ->
(B, embed_dim) embedding`` contract, so a converted ECAPA2 (when its
TorchScript weights are reachable) plugs into the same slot.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from vibravox_tpu.ops.mel import log_mel_spectrogram

__all__ = ["ECAPATDNN"]


class SEBlock(nn.Module):
    """Squeeze-excitation over the channel axis."""

    bottleneck: int = 128

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = jnp.mean(x, axis=1)  # (B, C)
        s = nn.relu(nn.Dense(self.bottleneck, name="fc1")(s))
        s = nn.sigmoid(nn.Dense(x.shape[-1], name="fc2")(s))
        return x * s[:, None, :]


class Res2NetTDNNBlock(nn.Module):
    """SE-Res2Net block: 1x1 conv → scale-split dilated convs → 1x1 conv → SE."""

    channels: int
    kernel_size: int
    dilation: int
    scale: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        residual = x
        h = nn.Conv(self.channels, (1,), name="conv_in")(x)
        h = nn.relu(h)
        h = nn.BatchNorm(use_running_average=True, name="bn_in")(h)

        width = self.channels // self.scale
        chunks = [h[..., i * width : (i + 1) * width] for i in range(self.scale)]
        outs = [chunks[0]]
        prev = None
        for i in range(1, self.scale):
            inp = chunks[i] if prev is None else chunks[i] + prev
            pad = (self.kernel_size - 1) * self.dilation // 2
            y = nn.Conv(
                width, (self.kernel_size,), kernel_dilation=(self.dilation,),
                padding=((pad, pad),), name=f"conv_{i}",
            )(inp)
            y = nn.relu(y)
            y = nn.BatchNorm(use_running_average=True, name=f"bn_{i}")(y)
            outs.append(y)
            prev = y
        h = jnp.concatenate(outs, axis=-1)

        h = nn.Conv(self.channels, (1,), name="conv_out")(h)
        h = nn.relu(h)
        h = nn.BatchNorm(use_running_average=True, name="bn_out")(h)
        h = SEBlock(name="se")(h)
        return h + residual


class AttentiveStatsPooling(nn.Module):
    """Channel-dependent attentive statistics pooling (mean ‖ std)."""

    bottleneck: int = 128

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # global context: concat(x, mean, std) per frame
        mean = jnp.mean(x, axis=1, keepdims=True)
        std = jnp.sqrt(jnp.var(x, axis=1, keepdims=True) + 1e-7)
        t = x.shape[1]
        ctx = jnp.concatenate(
            [x, jnp.broadcast_to(mean, x.shape), jnp.broadcast_to(std, x.shape)], axis=-1
        )
        attn = nn.tanh(nn.Conv(self.bottleneck, (1,), name="attn_1")(ctx))
        attn = nn.Conv(x.shape[-1], (1,), name="attn_2")(attn)
        attn = nn.softmax(attn, axis=1)
        mu = jnp.sum(attn * x, axis=1)
        sigma = jnp.sqrt(jnp.clip(jnp.sum(attn * x**2, axis=1) - mu**2, min=1e-7))
        return jnp.concatenate([mu, sigma], axis=-1)


class ECAPATDNN(nn.Module):
    """waveform (B, T) -> L2-normalizable embedding (B, embed_dim)."""

    channels: int = 512
    embed_dim: int = 192
    n_mels: int = 80
    sample_rate: int = 16000
    scale: int = 8

    @nn.compact
    def __call__(self, audio: jnp.ndarray) -> jnp.ndarray:
        feats = log_mel_spectrogram(
            audio, sample_rate=self.sample_rate, n_mels=self.n_mels
        )
        # per-utterance CMN
        feats = feats - jnp.mean(feats, axis=1, keepdims=True)

        h = nn.Conv(self.channels, (5,), padding=((2, 2),), name="conv_stem")(feats)
        h = nn.relu(h)
        h = nn.BatchNorm(use_running_average=True, name="bn_stem")(h)

        h1 = Res2NetTDNNBlock(self.channels, 3, 2, self.scale, name="block_1")(h)
        h2 = Res2NetTDNNBlock(self.channels, 3, 3, self.scale, name="block_2")(h1)
        h3 = Res2NetTDNNBlock(self.channels, 3, 4, self.scale, name="block_3")(h2)

        mfa = jnp.concatenate([h1, h2, h3], axis=-1)
        mfa = nn.relu(nn.Conv(1536, (1,), name="mfa_conv")(mfa))

        pooled = AttentiveStatsPooling(name="pooling")(mfa)
        pooled = nn.BatchNorm(use_running_average=True, name="bn_pool")(pooled)
        emb = nn.Dense(self.embed_dim, name="embedding")(pooled)
        return emb
