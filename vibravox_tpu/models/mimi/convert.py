"""HF / moshi Mimi checkpoint -> native flax params.

The reference builds its regressive-Mimi task on the *pretrained* kyutai
codec (``regressive_mimi.py:24-30``).  The canonical public distribution is
the HF ``MimiModel`` port (``kyutai/mimi``, transformers
``modeling_mimi.py``); this converter maps its state dict onto
:class:`vibravox_tpu.models.mimi.MimiModule` key-by-key and fails loudly on
any leftover, so a skeleton drift cannot silently mis-map.  Codebooks are
stored in the checkpoint in EMA form (``embed_sum`` / ``cluster_usage``)
and materialised to embeddings here.

Converted-forward parity against a randomly-initialised tiny HF MimiModel
is pinned by ``tests/test_mimi.py`` (encoder latents, decode round trip and
RVQ codes) — the same oracle chain the real weights will flow through.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from vibravox_tpu.models.mimi.mimi import MimiConfig

__all__ = ["mimi_params_from_hf_torch", "hf_mimi_config_to_native"]


def hf_mimi_config_to_native(hf_config) -> MimiConfig:
    """transformers ``MimiConfig`` -> :class:`MimiConfig`.

    Rejects HF configurations outside the native module's envelope (the
    released ``kyutai/mimi`` checkpoint satisfies all of these):
    plain MHA (no GQA), fused head dim == hidden size, and a single RVQ
    projection dimension.
    """
    if hf_config.num_key_value_heads != hf_config.num_attention_heads:
        raise ValueError("native MimiTransformer is MHA-only (no GQA)")
    if hf_config.head_dim * hf_config.num_attention_heads != hf_config.hidden_size:
        raise ValueError("native MimiTransformer requires head_dim*heads == hidden")
    if hf_config.vector_quantization_hidden_dimension != hf_config.codebook_dim:
        raise ValueError("native RVQ assumes vq_hidden_dimension == codebook_dim")
    return MimiConfig(
        sample_rate=hf_config.sampling_rate,
        dimension=hf_config.hidden_size,
        n_filters=hf_config.num_filters,
        ratios=tuple(hf_config.upsampling_ratios),
        transformer_layers=hf_config.num_hidden_layers,
        transformer_heads=hf_config.num_attention_heads,
        transformer_ff=hf_config.intermediate_size,
        sliding_window=hf_config.sliding_window,
        rvq_dimension=hf_config.codebook_dim,
        rvq_n_q=hf_config.num_quantizers,
        rvq_codebook_size=hf_config.codebook_size,
        downsample=hf_config.compress,
    )


def _conv(sd: Dict[str, np.ndarray], prefix: str, bias: bool = True) -> Dict[str, Any]:
    """torch Conv1d (out, in/g, k) -> CausalConv kernel (k, in/g, out)."""
    out = {"kernel": np.transpose(np.asarray(sd.pop(f"{prefix}.weight")), (2, 1, 0))}
    if bias:
        out["bias"] = np.asarray(sd.pop(f"{prefix}.bias"))
    return out


def _tconv(sd: Dict[str, np.ndarray], prefix: str, bias: bool = True) -> Dict[str, Any]:
    """torch ConvTranspose1d (in, out/g, k) — stored in torch layout."""
    out = {"kernel": np.asarray(sd.pop(f"{prefix}.weight"))}
    if bias:
        out["bias"] = np.asarray(sd.pop(f"{prefix}.bias"))
    return out


def _lin(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, Any]:
    return {"kernel": np.asarray(sd.pop(f"{prefix}.weight")).T}


def _ln(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, Any]:
    return {
        "scale": np.asarray(sd.pop(f"{prefix}.weight")),
        "bias": np.asarray(sd.pop(f"{prefix}.bias")),
    }


def _transformer(sd: Dict[str, np.ndarray], prefix: str, n_layers: int) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for i in range(n_layers):
        b = f"{prefix}.layers.{i}"
        out[f"layer_{i}"] = {
            "q_proj": _lin(sd, f"{b}.self_attn.q_proj"),
            "k_proj": _lin(sd, f"{b}.self_attn.k_proj"),
            "v_proj": _lin(sd, f"{b}.self_attn.v_proj"),
            "out_proj": _lin(sd, f"{b}.self_attn.o_proj"),
            "linear1": _lin(sd, f"{b}.mlp.fc1"),
            "linear2": _lin(sd, f"{b}.mlp.fc2"),
            "norm1": _ln(sd, f"{b}.input_layernorm"),
            "norm2": _ln(sd, f"{b}.post_attention_layernorm"),
            "layer_scale_1": np.asarray(sd.pop(f"{b}.self_attn_layer_scale.scale")),
            "layer_scale_2": np.asarray(sd.pop(f"{b}.mlp_layer_scale.scale")),
        }
    return out


def _seanet_encoder(sd: Dict[str, np.ndarray], n_ratios: int) -> Dict[str, Any]:
    # HF MimiEncoder layer indices: 0 stem, then per ratio [res, ELU, down]
    # (indices 1+3i, 3+3i), then a final ELU + conv at 3*n + 2
    out: Dict[str, Any] = {"conv_in": _conv(sd, "encoder.layers.0.conv")}
    for i in range(n_ratios):
        res = f"encoder.layers.{1 + 3 * i}.block"
        out[f"block_{i}_res_0"] = {
            "conv_0": _conv(sd, f"{res}.1.conv"),
            "conv_1": _conv(sd, f"{res}.3.conv"),
        }
        out[f"down_{i}"] = _conv(sd, f"encoder.layers.{3 + 3 * i}.conv")
    out["conv_out"] = _conv(sd, f"encoder.layers.{3 * n_ratios + 2}.conv")
    return out


def _seanet_decoder(sd: Dict[str, np.ndarray], n_ratios: int) -> Dict[str, Any]:
    # HF MimiDecoder: 0 stem, then per ratio [ELU, up, res] (up 2+3i, res 3+3i),
    # then final ELU + conv at 3*n + 2
    out: Dict[str, Any] = {"conv_in": _conv(sd, "decoder.layers.0.conv")}
    for i in range(n_ratios):
        out[f"up_{i}"] = _tconv(sd, f"decoder.layers.{2 + 3 * i}.conv")
        res = f"decoder.layers.{3 + 3 * i}.block"
        out[f"block_{i}_res_0"] = {
            "conv_0": _conv(sd, f"{res}.1.conv"),
            "conv_1": _conv(sd, f"{res}.3.conv"),
        }
    out["conv_out"] = _conv(sd, f"decoder.layers.{3 * n_ratios + 2}.conv")
    return out


def _rvq(sd: Dict[str, np.ndarray], prefix: str, n_q: int, eps: float = 1e-5) -> Dict[str, Any]:
    books = []
    for i in range(n_q):
        b = f"{prefix}.layers.{i}.codebook"
        sd.pop(f"{b}.initialized", None)
        usage = np.asarray(sd.pop(f"{b}.cluster_usage"))
        embed_sum = np.asarray(sd.pop(f"{b}.embed_sum"))
        books.append(embed_sum / np.maximum(usage, eps)[:, None])
    return {
        "codebooks": np.stack(books),
        "input_proj": {"kernel": np.asarray(sd.pop(f"{prefix}.input_proj.weight"))[:, :, 0].T},
        "output_proj": {"kernel": np.asarray(sd.pop(f"{prefix}.output_proj.weight"))[:, :, 0].T},
    }


def mimi_params_from_hf_torch(
    state_dict: Dict[str, np.ndarray], config: MimiConfig
) -> Dict[str, Any]:
    """HF ``MimiModel.state_dict()`` -> ``{"params": ...}`` for MimiModule."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    n_ratios = len(config.ratios)
    params: Dict[str, Any] = {
        "encoder": _seanet_encoder(sd, n_ratios),
        "decoder": _seanet_decoder(sd, n_ratios),
        "encoder_transformer": _transformer(sd, "encoder_transformer", config.transformer_layers),
        "decoder_transformer": _transformer(sd, "decoder_transformer", config.transformer_layers),
        "downsample": _conv(sd, "downsample.conv", bias=False),
        "upsample": _tconv(sd, "upsample.conv", bias=False),
        "quantizer": {
            "semantic": _rvq(sd, "quantizer.semantic_residual_vector_quantizer", 1),
            "acoustic": _rvq(
                sd, "quantizer.acoustic_residual_vector_quantizer", config.rvq_n_q - 1
            ),
        },
    }
    if sd:
        raise ValueError(
            f"unconsumed HF Mimi keys (skeleton drift): {sorted(sd)[:20]}"
        )
    return {"params": params}
