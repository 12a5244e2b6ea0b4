"""Small causal transformer for the Mimi encoder/decoder bottleneck.

Mimi wraps its SEANet latents with 8-layer causal transformers (RoPE,
layer-scale) — implemented here natively in flax with
``jax.nn.dot_product_attention`` and a standard rotary embedding.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["MimiTransformer"]


def _rope(q: jnp.ndarray, k: jnp.ndarray, base: float = 10000.0):
    """Rotary position embeddings on (B, T, H, D) q/k, in the rotate-half
    (LLaMA / HF-Mimi) convention: cos/sin are tiled over the two halves and
    ``rotate_half(x) = [-x2, x1]`` — NOT the interleaved-pair form, so
    converted HF/moshi weights reproduce attention exactly.  The angle table
    is built in f32, then cast to the q/k dtype so a bf16 compute path stays
    bf16 through the attention matmuls."""
    t = q.shape[1]
    d = q.shape[-1]
    inv_freq = 1.0 / (base ** (np.arange(0, d, 2) / d))
    freqs = jnp.arange(t)[:, None] * jnp.asarray(inv_freq)[None, :]  # (T, D/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # (T, D)
    cos = jnp.cos(emb)[None, :, None, :].astype(q.dtype)
    sin = jnp.sin(emb)[None, :, None, :].astype(q.dtype)

    def rot(x):
        x1, x2 = x[..., : d // 2], x[..., d // 2 :]
        return x * cos + jnp.concatenate([-x2, x1], axis=-1) * sin

    return rot(q), rot(k)


class TransformerLayer(nn.Module):
    d_model: int
    num_heads: int
    dim_feedforward: int
    layer_scale: float = 0.01
    causal: bool = True
    sliding_window: int | None = 250  # HF MimiConfig.sliding_window
    norm_eps: float = 1e-5
    # matmul compute dtype ("bfloat16" on TPU, where f32 matmuls are
    # software-emulated); params + layer norms + residual stream stay f32
    compute_dtype: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dt = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        x = x.astype(jnp.float32)
        h = nn.LayerNorm(epsilon=self.norm_eps, name="norm1")(x)
        heads, head_dim = self.num_heads, self.d_model // self.num_heads
        q = nn.Dense(self.d_model, use_bias=False, dtype=dt, name="q_proj")(h)
        k = nn.Dense(self.d_model, use_bias=False, dtype=dt, name="k_proj")(h)
        v = nn.Dense(self.d_model, use_bias=False, dtype=dt, name="v_proj")(h)

        def split(t):
            return t.reshape(t.shape[0], t.shape[1], heads, head_dim)

        q, k = _rope(split(q), split(k))
        window = (
            (self.sliding_window - 1, 0) if self.sliding_window is not None else None
        )
        attn = jax.nn.dot_product_attention(
            q, k, split(v), is_causal=self.causal, local_window_size=window
        )
        attn = nn.Dense(self.d_model, use_bias=False, dtype=dt, name="out_proj")(
            attn.reshape(h.shape)
        )
        ls1 = self.param("layer_scale_1", nn.initializers.constant(self.layer_scale),
                         (self.d_model,))
        x = x + ls1 * attn.astype(jnp.float32)

        h = nn.LayerNorm(epsilon=self.norm_eps, name="norm2")(x)
        ff = nn.Dense(self.dim_feedforward, use_bias=False, dtype=dt, name="linear1")(h)
        ff = nn.gelu(ff, approximate=False)  # HF hidden_act="gelu" (exact)
        ff = nn.Dense(self.d_model, use_bias=False, dtype=dt, name="linear2")(ff)
        ls2 = self.param("layer_scale_2", nn.initializers.constant(self.layer_scale),
                         (self.d_model,))
        return x + ls2 * ff.astype(jnp.float32)


class MimiTransformer(nn.Module):
    d_model: int = 512
    num_layers: int = 8
    num_heads: int = 8
    dim_feedforward: int = 2048
    layer_scale: float = 0.01
    causal: bool = True
    sliding_window: int | None = 250
    norm_eps: float = 1e-5
    compute_dtype: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.num_layers):
            x = TransformerLayer(
                self.d_model, self.num_heads, self.dim_feedforward,
                self.layer_scale, self.causal, self.sliding_window,
                self.norm_eps, self.compute_dtype, name=f"layer_{i}",
            )(x)
        return x
