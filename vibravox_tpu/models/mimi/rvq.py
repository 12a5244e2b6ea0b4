"""Residual vector quantization (jit-compiled, channels-last).

Mimi's split RVQ: one semantic quantizer + N−1 acoustic quantizers, each a
codebook lookup on the residual, with input/output projections between the
model dimension and the codebook dimension.  Nearest-neighbour encode is a
single batched matmul per stage (distances via ‖x‖²−2x·C+‖C‖² — MXU), so
both directions vectorize on TPU.  Codebooks follow the inference
formulation (EMA codebook training is out of scope for the regressive-Mimi
task, which freezes the quantizer — ``regressive_mimi.py:32-38``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["ResidualVectorQuantizer", "SplitResidualVectorQuantizer"]


def _nearest(codebook: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """codebook (K, D), x (..., D) -> indices (...,) via min L2 distance."""
    dots = jnp.einsum("...d,kd->...k", x, codebook, preferred_element_type=jnp.float32)
    c_norm = jnp.sum(codebook**2, axis=-1)
    dist = c_norm - 2.0 * dots  # ‖x‖² is constant w.r.t. k
    return jnp.argmin(dist, axis=-1)


class ResidualVectorQuantizer(nn.Module):
    """n_q-stage residual VQ with in/out projections."""

    dimension: int = 256  # codebook dim
    input_dimension: int = 512
    output_dimension: int = 512
    n_q: int = 8
    codebook_size: int = 2048

    def setup(self):
        self.codebooks = self.param(
            "codebooks",
            nn.initializers.normal(1.0),
            (self.n_q, self.codebook_size, self.dimension),
        )
        self.input_proj = nn.Dense(self.dimension, use_bias=False, name="input_proj")
        self.output_proj = nn.Dense(
            self.output_dimension, use_bias=False, name="output_proj"
        )

    def __call__(self, x: jnp.ndarray, n_q: Optional[int] = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x (B, T, input_dim) -> (quantized (B, T, output_dim), codes (n_q, B, T))."""
        n_q = n_q or self.n_q
        h = self.input_proj(x)
        residual = h
        quantized = jnp.zeros_like(h)
        codes = []
        for q in range(n_q):
            idx = _nearest(self.codebooks[q], residual)
            selected = jnp.take(self.codebooks[q], idx, axis=0)
            quantized = quantized + selected
            residual = residual - selected
            codes.append(idx)
        # straight-through estimator for any gradient users
        quantized = h + jax.lax.stop_gradient(quantized - h)
        return self.output_proj(quantized), jnp.stack(codes)

    def decode(self, codes: jnp.ndarray) -> jnp.ndarray:
        """codes (n_q, B, T) -> (B, T, output_dim)."""
        quantized = 0.0
        for q in range(codes.shape[0]):
            quantized = quantized + jnp.take(self.codebooks[q], codes[q], axis=0)
        return self.output_proj(quantized)


class SplitResidualVectorQuantizer(nn.Module):
    """Mimi's 1 semantic + (n_q − 1) acoustic split RVQ."""

    dimension: int = 256
    input_dimension: int = 512
    output_dimension: int = 512
    n_q: int = 8
    codebook_size: int = 2048

    def setup(self):
        self.semantic = ResidualVectorQuantizer(
            self.dimension, self.input_dimension, self.output_dimension,
            1, self.codebook_size, name="semantic",
        )
        self.acoustic = ResidualVectorQuantizer(
            self.dimension, self.input_dimension, self.output_dimension,
            self.n_q - 1, self.codebook_size, name="acoustic",
        )

    def __call__(self, x: jnp.ndarray, n_q: Optional[int] = None):
        n_q = n_q or self.n_q
        q_sem, c_sem = self.semantic(x, 1)
        q_ac, c_ac = self.acoustic(x, n_q - 1)
        return q_sem + q_ac, jnp.concatenate([c_sem, c_ac], axis=0)

    def decode(self, codes: jnp.ndarray) -> jnp.ndarray:
        return self.semantic.decode(codes[:1]) + self.acoustic.decode(codes[1:])
