"""Mimi neural codec: SEANet + bottleneck transformers + split RVQ.

Native reimplementation of the codec the reference loads from the
``moshi`` package (``regressive_mimi.py:24-30``): 24 kHz audio, 12.5 Hz
frame rate (SEANet hop 8·6·5·4 = 960 then a ×2 downsample conv → 1920
samples/frame), 512-d latents, split residual VQ.

API mirrors what the reference task consumes:
  * ``encode_to_latent(audio, quantize=False)`` — unquantized latents
    (the regressive-Mimi training signal);
  * ``encode(audio)`` — RVQ codes; ``decode(codes)`` — waveform;
  * ``frame_size`` — the 1920-sample padding unit (``regressive_mimi.py:91-97``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vibravox_tpu.models.mimi.rvq import SplitResidualVectorQuantizer
from vibravox_tpu.models.mimi.seanet import CausalConv, CausalConvTranspose, SEANetDecoder, SEANetEncoder
from vibravox_tpu.models.mimi.transformer import MimiTransformer

__all__ = ["MimiModule", "Mimi", "MimiConfig"]


@dataclasses.dataclass(frozen=True)
class MimiConfig:
    sample_rate: int = 24000
    dimension: int = 512
    n_filters: int = 64
    ratios: Tuple[int, ...] = (8, 6, 5, 4)
    transformer_layers: int = 8
    transformer_heads: int = 8
    transformer_ff: int = 2048
    sliding_window: int = 250
    rvq_dimension: int = 256
    # the released kyutai/mimi codec has 32 quantizers (1 semantic + 31
    # acoustic); the reference trains with all of them (regressive_mimi.py:29
    # set_num_codebooks(total_codebooks))
    rvq_n_q: int = 32
    rvq_codebook_size: int = 2048
    downsample: int = 2  # encoder-side extra stride (25 Hz -> 12.5 Hz)
    # matmul/conv compute dtype ("bfloat16" on TPU, where f32 matmuls are
    # software-emulated); params stay f32 masters, layer norms + the RVQ
    # codebook distances + losses stay f32
    compute_dtype: Optional[str] = None

    @property
    def hop_length(self) -> int:
        hop = self.downsample
        for r in self.ratios:
            hop *= r
        return hop  # 1920 at defaults


def _tiny_config() -> MimiConfig:
    return MimiConfig(
        dimension=32, n_filters=4, ratios=(4, 2), transformer_layers=1,
        transformer_heads=2, transformer_ff=64, rvq_dimension=16,
        rvq_n_q=4, rvq_codebook_size=64, downsample=2,
    )


class MimiModule(nn.Module):
    config: MimiConfig = MimiConfig()

    def setup(self):
        cfg = self.config
        self.encoder = SEANetEncoder(
            dimension=cfg.dimension, n_filters=cfg.n_filters, ratios=cfg.ratios,
            compute_dtype=cfg.compute_dtype, name="encoder",
        )
        self.encoder_transformer = MimiTransformer(
            d_model=cfg.dimension, num_layers=cfg.transformer_layers,
            num_heads=cfg.transformer_heads, dim_feedforward=cfg.transformer_ff,
            sliding_window=cfg.sliding_window, compute_dtype=cfg.compute_dtype,
            name="encoder_transformer",
        )
        # HF MimiModel: biasless downsample conv; biasless per-channel
        # (groups = hidden) transposed upsample conv
        self.downsample_conv = CausalConv(
            cfg.dimension, 2 * cfg.downsample, stride=cfg.downsample,
            use_bias=False, pad_mode="replicate",
            compute_dtype=cfg.compute_dtype, name="downsample",
        )
        self.upsample_conv = CausalConvTranspose(
            cfg.dimension, 2 * cfg.downsample, stride=cfg.downsample,
            groups=cfg.dimension, use_bias=False,
            compute_dtype=cfg.compute_dtype, name="upsample",
        )
        self.decoder_transformer = MimiTransformer(
            d_model=cfg.dimension, num_layers=cfg.transformer_layers,
            num_heads=cfg.transformer_heads, dim_feedforward=cfg.transformer_ff,
            sliding_window=cfg.sliding_window, compute_dtype=cfg.compute_dtype,
            name="decoder_transformer",
        )
        self.decoder = SEANetDecoder(
            dimension=cfg.dimension, n_filters=cfg.n_filters, ratios=cfg.ratios,
            compute_dtype=cfg.compute_dtype, name="decoder",
        )
        self.quantizer = SplitResidualVectorQuantizer(
            dimension=cfg.rvq_dimension, input_dimension=cfg.dimension,
            output_dimension=cfg.dimension, n_q=cfg.rvq_n_q,
            codebook_size=cfg.rvq_codebook_size, name="quantizer",
        )

    # ------------------------------------------------------------------ #

    def encode_to_latent(self, audio: jnp.ndarray) -> jnp.ndarray:
        """audio (B, T, 1) -> unquantized latent (B, T/hop, D), f32 at the
        boundary regardless of ``compute_dtype`` (losses + RVQ stay f32)."""
        h = self.encoder(audio)
        h = self.encoder_transformer(h)
        return self.downsample_conv(h).astype(jnp.float32)

    def encode(self, audio: jnp.ndarray) -> jnp.ndarray:
        """audio -> RVQ codes (n_q, B, T')."""
        _, codes = self.quantizer(self.encode_to_latent(audio))
        return codes

    def quantize_latent(self, latent: jnp.ndarray) -> jnp.ndarray:
        quantized, _ = self.quantizer(latent)
        return quantized

    def decode_latent(self, latent: jnp.ndarray) -> jnp.ndarray:
        quantized, _ = self.quantizer(latent)
        h = self.upsample_conv(quantized)
        h = self.decoder_transformer(h)
        return self.decoder(h)

    def decode(self, codes: jnp.ndarray) -> jnp.ndarray:
        """RVQ codes (n_q, B, T') -> waveform (B, T, 1)."""
        quantized = self.quantizer.decode(codes)
        h = self.upsample_conv(quantized)
        h = self.decoder_transformer(h)
        return self.decoder(h)

    def __call__(self, audio: jnp.ndarray) -> jnp.ndarray:
        """Full round trip audio -> codes -> audio (for init/tests)."""
        latent = self.encode_to_latent(audio)
        return self.decode_latent(latent)


class Mimi:
    """Convenience wrapper holding config + params with method dispatch."""

    def __init__(self, config: Optional[MimiConfig] = None, params: Optional[Any] = None,
                 preset: Optional[str] = None, seed: int = 0, **overrides):
        if config is None:
            config = _tiny_config() if preset == "tiny" else MimiConfig(**overrides)
        self.config = config
        self.module = MimiModule(config)
        self.frame_size = config.hop_length
        if params is None:
            t = 4 * config.hop_length
            params = self.module.init(jax.random.key(seed), jnp.zeros((1, t, 1)))
        self.params = params

    def valid_length(self, length: int) -> int:
        """Round *up* to a frame multiple (ref pads — ``regressive_mimi.py:91-97``)."""
        return -(-length // self.frame_size) * self.frame_size

    def encode_to_latent(self, audio, params=None):
        return self.module.apply(params or self.params, audio, method="encode_to_latent")

    def encode(self, audio, params=None):
        return self.module.apply(params or self.params, audio, method="encode")

    def decode_latent(self, latent, params=None):
        return self.module.apply(params or self.params, latent, method="decode_latent")

    def decode(self, codes, params=None):
        return self.module.apply(params or self.params, codes, method="decode")
