"""Native wav2vec2-CTC implementation (flax linen, TPU-first).

The reference delegates this network to HF transformers' *torch*
implementation (``wav2vec2_for_stp.py:31-34``).  HF's Flax port only
implements the stable-layer-norm ("large") variant, while the reference
fine-tunes ``facebook/wav2vec2-base-fr-voxpopuli-v2`` — a post-norm "base"
model — so this framework implements the architecture natively:

  * conv feature encoder (7 layers, 512 ch, ~320× downsample), group-norm
    first layer (``feat_extract_norm='group'``), GELU;
  * feature projection LayerNorm → Linear(768) → dropout;
  * grouped conv positional embedding (k=128, 16 groups, weight-normed);
  * 12-layer post-norm transformer encoder with SpecAugment time/feature
    masking and layerdrop;
  * CTC head.

Everything is channels-last and jit-compiled; attention uses
``jax.nn.dot_product_attention``.  A weight converter maps HF torch
checkpoints into this module's params (tested for logit parity against the
torch implementation).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "Wav2Vec2Config",
    "Wav2Vec2ForCTCModule",
    "Wav2Vec2ForCTC",
    "wav2vec2_for_ctc_from_pretrained",
    "wav2vec2_for_ctc_from_config",
    "wav2vec2_params_from_torch",
    "wav2vec2_params_to_torch",
    "TINY_W2V2_CONFIG",
]


@dataclasses.dataclass(frozen=True)
class Wav2Vec2Config:
    vocab_size: int = 38
    pad_token_id: int = 35
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    conv_dim: Tuple[int, ...] = (512, 512, 512, 512, 512, 512, 512)
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = False
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    feat_extract_norm: str = "group"  # "group" (base) | "layer" (large)
    do_stable_layer_norm: bool = False
    layer_norm_eps: float = 1e-5
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.1
    feat_proj_dropout: float = 0.1
    final_dropout: float = 0.0
    layerdrop: float = 0.0
    apply_spec_augment: bool = True
    mask_time_prob: float = 0.05
    mask_time_length: int = 10
    mask_time_min_masks: int = 2
    mask_feature_prob: float = 0.0
    mask_feature_length: int = 10
    mask_feature_min_masks: int = 0
    # matmul/conv compute dtype ("bfloat16" on TPU, where f32 matmuls are
    # software-emulated); params stay f32 masters, layer norms accumulate in
    # f32 (flax dtype promotion), CTC loss consumes f32 logits
    compute_dtype: Optional[str] = None
    # positional-conv backward: the SPMD-safe custom vjp (ops/conv.py)
    # works around a GSPMD bug that mis-scales the grouped dW on meshes
    # with a model axis > 1 — but costs ~7.5 ms/step at the STP recipe
    # batch (measured: 795 vs 1056 audio-s/s single-chip).  Default SAFE;
    # DataParallel flips it off via the task's configure_for_mesh hook
    # whenever the mesh's model axis is 1 (the bug multiplies dW by the
    # model-axis size, so size 1 is exact).  Both paths are numerically
    # identical — the multi-device equivalence suite crosses them.
    spmd_safe_pos_conv: bool = True

    def feat_extract_output_length(self, input_length: int) -> int:
        for k, s in zip(self.conv_kernel, self.conv_stride):
            input_length = (input_length - k) // s + 1
        return input_length


TINY_W2V2_CONFIG: Dict[str, Any] = dict(
    hidden_size=32,
    num_hidden_layers=2,
    num_attention_heads=2,
    intermediate_size=64,
    # keep the base model's full 320x downsampling stack (narrow channels):
    # a shallower stack leaves ~10k-frame sequences and quadratic attention
    conv_dim=(32, 32, 32, 32, 32, 32, 32),
    conv_kernel=(10, 3, 3, 3, 3, 2, 2),
    conv_stride=(5, 2, 2, 2, 2, 2, 2),
    num_conv_pos_embeddings=16,
    num_conv_pos_embedding_groups=2,
)


# --------------------------------------------------------------------------- #
# Modules
# --------------------------------------------------------------------------- #


class _FeatureConv(nn.Module):
    """One feature-encoder conv (VALID, strided) with a space-to-depth
    matmul fast path.

    XLA's strided-conv lowering ran the b8-recipe feature extractor at
    ~35% MFU (conv_1 alone 873 us/step in the round-4 profile).  Every
    layer of the wav2vec2 stack satisfies ``stride <= kernel <= 2*stride``,
    so output ``t`` reads at most two space-to-depth rows of width
    ``stride``:

        z = x.reshape(B, T/s, s*Cin)
        y[t] = z[t] @ W0  +  z[t+1, :(k-s)*Cin] @ W1

    — two dense stride-1 matmuls (``W0`` = taps ``0..s-1``, ``W1`` = taps
    ``s..k-1``), with the second operand LANE-SLICED rather than the kernel
    zero-padded, so the FLOP count is exactly the conv's (no packed-zero
    inflation; MFU stays honest).  Param tree is identical to ``nn.Conv``
    (``kernel`` WIO + optional ``bias``), so checkpoints and the torch
    converters (``wav2vec2_params_from_torch``) are unaffected.

    MEASURED AND REJECTED on the v5e (round 4, b8 recipe): 852 vs 1032
    audio-s/s — the lane-widening reshape is NOT free in the C-minor tiled
    layout (a 162 us full-tensor relayout per layer), the one-row time pad
    is another full copy (237 us), and the resulting dots only reach ~40%
    MFU vs the conv lowering's ~35%, so the overheads dominate.  Kept
    opt-in behind ``VIBRAVOX_PACKED_W2V2=1`` (default OFF) as the measured
    record; both paths (values AND grads) are exactness-pinned in
    ``tests/test_stp.py::TestPackedFeatureConv``.
    """

    features: int
    kernel_size: int
    stride: int
    use_bias: bool
    dtype: Optional[Any]

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import os

        k, s, cout = self.kernel_size, self.stride, self.features
        cin = x.shape[-1]
        # same distribution as nn.Conv's default (lecun_normal over the
        # conv fan-in k*cin — variance_scaling counts receptive field)
        w = self.param(
            "kernel", nn.initializers.lecun_normal(), (k, cin, cout)
        )
        b = self.param("bias", nn.initializers.zeros_init(), (cout,)) if self.use_bias else None
        dt = self.dtype
        if dt is not None:
            x, w = x.astype(dt), w.astype(dt)
            b = b.astype(dt) if b is not None else None

        batch, t = x.shape[0], x.shape[1]
        t_out = (t - k) // s + 1
        packed = (
            os.environ.get("VIBRAVOX_PACKED_W2V2", "0") == "1"
            and 1 < s <= k <= 2 * s
            and t_out >= 1
        )
        if packed:
            rows = -(-t // s)  # ceil: k <= 2s guarantees rows >= t_out + 1
            if rows * s != t:
                x = jnp.pad(x, ((0, 0), (0, rows * s - t), (0, 0)))
            z = x.reshape(batch, rows, s * cin)
            w0 = w[:s].reshape(s * cin, cout)
            y = jnp.einsum("btc,cd->btd", z[:, :t_out], w0)
            if k > s:
                w1 = w[s:].reshape((k - s) * cin, cout)
                y = y + jnp.einsum(
                    "btc,cd->btd", z[:, 1 : t_out + 1, : (k - s) * cin], w1
                )
        else:
            y = jax.lax.conv_general_dilated(
                x, w, (s,), "VALID",
                dimension_numbers=("NWC", "WIO", "NWC"),
            )
        return y + b if b is not None else y


class FeatureEncoder(nn.Module):
    """Conv feature extractor: waveform (B, T) -> (B, T', conv_dim[-1])."""

    config: Wav2Vec2Config

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        dt = jnp.dtype(cfg.compute_dtype) if cfg.compute_dtype else None
        h = x[:, :, None]
        for i, (dim, kernel, stride) in enumerate(
            zip(cfg.conv_dim, cfg.conv_kernel, cfg.conv_stride)
        ):
            h = _FeatureConv(
                features=dim, kernel_size=kernel, stride=stride,
                use_bias=cfg.conv_bias, dtype=dt, name=f"conv_{i}",
            )(h)
            if cfg.feat_extract_norm == "group" and i == 0:
                h = nn.GroupNorm(num_groups=dim, epsilon=cfg.layer_norm_eps,
                                 name="group_norm")(h)
            elif cfg.feat_extract_norm == "layer":
                h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name=f"layer_norm_{i}")(h)
            h = nn.gelu(h, approximate=False)
        return h


class PositionalConvEmbedding(nn.Module):
    """Grouped conv positional embedding with torch weight-norm(dim=2)."""

    config: Wav2Vec2Config

    @nn.compact
    def __call__(self, h: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        k = cfg.num_conv_pos_embeddings
        groups = cfg.num_conv_pos_embedding_groups
        dim = cfg.hidden_size
        # torch stores weight (out, in/groups, k) with weight_norm dim=2:
        # g has shape (1, 1, k) — norm over (out, in/groups) per tap.
        v = self.param(
            "conv_v",
            nn.initializers.he_normal(),
            (k, dim // groups, dim),
        )
        g = self.param(
            "conv_g",
            lambda rng, shape: jnp.sqrt(
                jnp.sum(jax.lax.stop_gradient(v) ** 2, axis=(1, 2))
            ),
            (k,),
        )
        norm = jnp.sqrt(jnp.sum(v**2, axis=(1, 2), keepdims=True))
        kernel = v * (g[:, None, None] / norm)
        bias = self.param("conv_bias", nn.initializers.zeros, (dim,))
        pad = k // 2
        # custom-vjp grouped conv: XLA's grouped kernel-grad transpose is
        # mis-reduced by GSPMD on (data, model) meshes with model > 1 for
        # this config (dW x model-axis-size — see
        # ops/conv.py::grouped_conv1d_spmd_safe); on model==1 meshes the
        # plain XLA path is exact and ~7.5 ms/step faster (config flag)
        from vibravox_tpu.ops.conv import (
            _conv1d_raw,
            grouped_conv1d_batched,
            grouped_conv1d_spmd_safe,
        )

        if cfg.compute_dtype:
            dt = jnp.dtype(cfg.compute_dtype)
            h = h.astype(dt)
            kernel = kernel.astype(dt)
        if cfg.spmd_safe_pos_conv:
            out = grouped_conv1d_spmd_safe(h, kernel, (pad, pad), groups) + bias
        else:
            import os

            # batch-grouped formulation (see grouped_conv1d_batched):
            # bitwise-identical and 300x faster STANDALONE, but measured
            # NEUTRAL inside the full train step (22.6 vs 22.4 ms at the b8
            # recipe — the grouped conv's cost sits in the step's scheduling
            # shadow).  Kept opt-in as the measured record; model==1 meshes
            # only (batch_group_count untested against the model>1 GSPMD
            # bug class — the spmd_safe branch covers those meshes)
            if os.environ.get("VIBRAVOX_POSCONV_BATCHED", "0") == "1":
                out = grouped_conv1d_batched(h, kernel, (pad, pad), groups) + bias
            else:
                out = _conv1d_raw(h, kernel, 1, (pad, pad), 1, groups) + bias
        if k % 2 == 0:
            out = out[:, :-1, :]
        return nn.gelu(out, approximate=False)


class EncoderLayer(nn.Module):
    """Post-norm transformer layer (wav2vec2-base ordering)."""

    config: Wav2Vec2Config

    @nn.compact
    def __call__(self, h: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        cfg = self.config
        dt = jnp.dtype(cfg.compute_dtype) if cfg.compute_dtype else None
        heads = cfg.num_attention_heads
        head_dim = cfg.hidden_size // heads

        residual = h
        q = nn.Dense(cfg.hidden_size, dtype=dt, name="q_proj")(h)
        k = nn.Dense(cfg.hidden_size, dtype=dt, name="k_proj")(h)
        v = nn.Dense(cfg.hidden_size, dtype=dt, name="v_proj")(h)

        def split(t):
            return t.reshape(t.shape[0], t.shape[1], heads, head_dim)

        attn = jax.nn.dot_product_attention(split(q), split(k), split(v))
        attn = attn.reshape(h.shape)
        attn = nn.Dense(cfg.hidden_size, dtype=dt, name="out_proj")(attn)
        attn = nn.Dropout(cfg.hidden_dropout)(attn, deterministic=deterministic)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="layer_norm")(residual + attn)

        residual = h
        ff = nn.Dense(cfg.intermediate_size, dtype=dt, name="intermediate_dense")(h)
        ff = nn.gelu(ff, approximate=False)
        ff = nn.Dropout(cfg.activation_dropout)(ff, deterministic=deterministic)
        ff = nn.Dense(cfg.hidden_size, dtype=dt, name="output_dense")(ff)
        ff = nn.Dropout(cfg.hidden_dropout)(ff, deterministic=deterministic)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="final_layer_norm")(residual + ff)


def _compute_span_mask(
    rng: jax.Array, shape: Tuple[int, int], prob: float, span: int, min_masks: int
) -> jnp.ndarray:
    """Static-shape SpecAugment span mask: (B, T) bool.

    Draws ``num_spans`` start positions per row and ORs their spans —
    jit-friendly reformulation of HF's numpy mask generator with identical
    expected masking rate.
    """
    batch, length = shape
    num_spans = max(min_masks, int(prob * length / span))
    if num_spans == 0 or span >= length:
        return jnp.zeros(shape, bool)
    starts = jax.random.randint(rng, (batch, num_spans), 0, length - span)
    pos = jnp.arange(length)[None, None, :]
    hit = (pos >= starts[..., None]) & (pos < (starts[..., None] + span))
    return jnp.any(hit, axis=1)


class Wav2Vec2ForCTCModule(nn.Module):
    """Full model: waveform (B, T) -> logits (B, T', vocab)."""

    config: Wav2Vec2Config

    @nn.compact
    def __call__(
        self,
        input_values: jnp.ndarray,
        train: bool = False,
        freeze_feature_encoder: bool = False,
        return_features: bool = False,
    ) -> jnp.ndarray:
        cfg = self.config
        deterministic = not train

        feats = FeatureEncoder(cfg, name="feature_encoder")(input_values)
        if freeze_feature_encoder:
            feats = jax.lax.stop_gradient(feats)

        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="feat_proj_layer_norm")(feats)
        h = nn.Dense(
            cfg.hidden_size,
            dtype=jnp.dtype(cfg.compute_dtype) if cfg.compute_dtype else None,
            name="feat_projection",
        )(h)
        h = nn.Dropout(cfg.feat_proj_dropout)(h, deterministic=deterministic)

        # SpecAugment (ref: HF applies inside the model when training).
        # The mask embedding must exist regardless of `train` so init and
        # apply see the same param tree.
        if cfg.apply_spec_augment:
            mask_embed = self.param(
                "masked_spec_embed",
                nn.initializers.uniform(scale=1.0),
                (cfg.hidden_size,),
            )
        if train and cfg.apply_spec_augment:
            if cfg.mask_time_prob > 0:
                rng = self.make_rng("spec_augment")
                time_mask = _compute_span_mask(
                    rng, h.shape[:2], cfg.mask_time_prob, cfg.mask_time_length,
                    cfg.mask_time_min_masks,
                )
                h = jnp.where(time_mask[:, :, None], mask_embed[None, None, :], h)
            if cfg.mask_feature_prob > 0:
                rng = self.make_rng("spec_augment")
                feat_mask = _compute_span_mask(
                    rng, (h.shape[0], h.shape[2]), cfg.mask_feature_prob,
                    cfg.mask_feature_length, cfg.mask_feature_min_masks,
                )
                h = jnp.where(feat_mask[:, None, :], 0.0, h)

        pos = PositionalConvEmbedding(cfg, name="pos_conv_embed")(h)
        h = h + pos
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="encoder_layer_norm")(h)
        h = nn.Dropout(cfg.hidden_dropout)(h, deterministic=deterministic)

        for i in range(cfg.num_hidden_layers):
            layer = EncoderLayer(cfg, name=f"layer_{i}")
            if train and cfg.layerdrop > 0:
                rng = self.make_rng("layerdrop")
                keep = jax.random.bernoulli(rng, 1.0 - cfg.layerdrop)
                h = jnp.where(keep, layer(h, deterministic), h)
            else:
                h = layer(h, deterministic)

        if return_features:
            # last-layer hidden states (B, T', hidden) — SSL feature surface
            # used by e.g. the SQUIM subjective (NORESQA-MOS) predictor
            return h
        h = nn.Dropout(cfg.final_dropout)(h, deterministic=deterministic)
        logits = nn.Dense(
            cfg.vocab_size,
            dtype=jnp.dtype(cfg.compute_dtype) if cfg.compute_dtype else None,
            name="lm_head",
        )(h)
        return logits.astype(jnp.float32)  # CTC/decoding consume f32 logits


# --------------------------------------------------------------------------- #
# User-facing wrapper (holds config + params, HF-like call surface)
# --------------------------------------------------------------------------- #


class Wav2Vec2ForCTC:
    def __init__(self, config: Wav2Vec2Config, params: Optional[Any] = None, seed: int = 0):
        self.config = config
        self.module = Wav2Vec2ForCTCModule(config)
        if params is None:
            dummy = jnp.zeros((1, 4000))
            params = self.module.init(
                {"params": jax.random.key(seed)}, dummy, train=False
            )["params"]
        self.params = params

    def __call__(
        self,
        input_values: jnp.ndarray,
        params: Optional[Any] = None,
        dropout_rng: Optional[jax.Array] = None,
        train: bool = False,
        freeze_feature_encoder: bool = False,
    ):
        rngs = {}
        if train:
            key = dropout_rng if dropout_rng is not None else jax.random.key(0)
            k1, k2, k3 = jax.random.split(key, 3)
            rngs = {"dropout": k1, "spec_augment": k2, "layerdrop": k3}
        logits = self.module.apply(
            {"params": params if params is not None else self.params},
            input_values,
            train=train,
            freeze_feature_encoder=freeze_feature_encoder,
            rngs=rngs,
        )

        class _Out:
            pass

        out = _Out()
        out.logits = logits
        return out


# --------------------------------------------------------------------------- #
# Torch checkpoint conversion
# --------------------------------------------------------------------------- #


def wav2vec2_params_from_torch(sd: Dict[str, np.ndarray], config: Wav2Vec2Config) -> Dict[str, Any]:
    """HF torch ``Wav2Vec2ForCTC`` state dict -> native flax params."""

    def lin(prefix):
        return {
            "kernel": np.asarray(sd[f"{prefix}.weight"]).T,
            "bias": np.asarray(sd[f"{prefix}.bias"]),
        }

    def ln(prefix):
        return {
            "scale": np.asarray(sd[f"{prefix}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bias"]),
        }

    p: Dict[str, Any] = {}
    fe: Dict[str, Any] = {}
    for i in range(len(config.conv_dim)):
        w = np.asarray(sd[f"wav2vec2.feature_extractor.conv_layers.{i}.conv.weight"])
        conv = {"kernel": np.transpose(w, (2, 1, 0))}
        if config.conv_bias:
            conv["bias"] = np.asarray(sd[f"wav2vec2.feature_extractor.conv_layers.{i}.conv.bias"])
        fe[f"conv_{i}"] = conv
    if config.feat_extract_norm == "group":
        fe["group_norm"] = ln("wav2vec2.feature_extractor.conv_layers.0.layer_norm")
    else:
        for i in range(len(config.conv_dim)):
            fe[f"layer_norm_{i}"] = ln(f"wav2vec2.feature_extractor.conv_layers.{i}.layer_norm")
    p["feature_encoder"] = fe

    p["feat_proj_layer_norm"] = ln("wav2vec2.feature_projection.layer_norm")
    p["feat_projection"] = lin("wav2vec2.feature_projection.projection")

    # positional conv: torch weight (out, in/g, k), weight_norm dim=2
    base = "wav2vec2.encoder.pos_conv_embed.conv"
    if f"{base}.parametrizations.weight.original0" in sd:
        g = np.asarray(sd[f"{base}.parametrizations.weight.original0"])
        v = np.asarray(sd[f"{base}.parametrizations.weight.original1"])
    else:  # older torch naming
        g = np.asarray(sd[f"{base}.weight_g"])
        v = np.asarray(sd[f"{base}.weight_v"])
    p["pos_conv_embed"] = {
        "conv_v": np.transpose(v, (2, 1, 0)),  # -> (k, in/g, out)
        "conv_g": g.reshape(-1),
        "conv_bias": np.asarray(sd[f"{base}.bias"]),
    }
    p["encoder_layer_norm"] = ln("wav2vec2.encoder.layer_norm")

    for i in range(config.num_hidden_layers):
        b = f"wav2vec2.encoder.layers.{i}"
        p[f"layer_{i}"] = {
            "q_proj": lin(f"{b}.attention.q_proj"),
            "k_proj": lin(f"{b}.attention.k_proj"),
            "v_proj": lin(f"{b}.attention.v_proj"),
            "out_proj": lin(f"{b}.attention.out_proj"),
            "layer_norm": ln(f"{b}.layer_norm"),
            "intermediate_dense": lin(f"{b}.feed_forward.intermediate_dense"),
            "output_dense": lin(f"{b}.feed_forward.output_dense"),
            "final_layer_norm": ln(f"{b}.final_layer_norm"),
        }

    p["masked_spec_embed"] = np.asarray(
        sd.get("wav2vec2.masked_spec_embed", np.zeros((config.hidden_size,), np.float32))
    )
    p["lm_head"] = lin("lm_head")
    return jax.tree_util.tree_map(jnp.asarray, p)


def wav2vec2_params_to_torch(params: Any, config: Wav2Vec2Config) -> Dict[str, np.ndarray]:
    """Native flax params -> HF torch ``Wav2Vec2ForCTC`` state dict.

    Enables the phonemizer hub-upload flow (the reference pushes
    ``Wav2Vec2ForCTC`` weights — ``wav2vec2_for_stp.py:139-154``).
    """
    p = params["params"] if "params" in params else params
    sd: Dict[str, np.ndarray] = {}

    def put_lin(prefix, node):
        sd[f"{prefix}.weight"] = np.asarray(node["kernel"]).T
        sd[f"{prefix}.bias"] = np.asarray(node["bias"])

    def put_ln(prefix, node):
        sd[f"{prefix}.weight"] = np.asarray(node["scale"])
        sd[f"{prefix}.bias"] = np.asarray(node["bias"])

    fe = p["feature_encoder"]
    for i in range(len(config.conv_dim)):
        w = np.asarray(fe[f"conv_{i}"]["kernel"])
        sd[f"wav2vec2.feature_extractor.conv_layers.{i}.conv.weight"] = np.transpose(w, (2, 1, 0))
        if config.conv_bias:
            sd[f"wav2vec2.feature_extractor.conv_layers.{i}.conv.bias"] = np.asarray(
                fe[f"conv_{i}"]["bias"]
            )
    if config.feat_extract_norm == "group":
        put_ln("wav2vec2.feature_extractor.conv_layers.0.layer_norm", fe["group_norm"])
    else:
        for i in range(len(config.conv_dim)):
            put_ln(f"wav2vec2.feature_extractor.conv_layers.{i}.layer_norm", fe[f"layer_norm_{i}"])

    put_ln("wav2vec2.feature_projection.layer_norm", p["feat_proj_layer_norm"])
    put_lin("wav2vec2.feature_projection.projection", p["feat_projection"])

    pce = p["pos_conv_embed"]
    base = "wav2vec2.encoder.pos_conv_embed.conv"
    sd[f"{base}.parametrizations.weight.original0"] = np.asarray(pce["conv_g"]).reshape(1, 1, -1)
    sd[f"{base}.parametrizations.weight.original1"] = np.transpose(
        np.asarray(pce["conv_v"]), (2, 1, 0)
    )
    sd[f"{base}.bias"] = np.asarray(pce["conv_bias"])
    put_ln("wav2vec2.encoder.layer_norm", p["encoder_layer_norm"])

    for i in range(config.num_hidden_layers):
        b = f"wav2vec2.encoder.layers.{i}"
        layer = p[f"layer_{i}"]
        put_lin(f"{b}.attention.q_proj", layer["q_proj"])
        put_lin(f"{b}.attention.k_proj", layer["k_proj"])
        put_lin(f"{b}.attention.v_proj", layer["v_proj"])
        put_lin(f"{b}.attention.out_proj", layer["out_proj"])
        put_ln(f"{b}.layer_norm", layer["layer_norm"])
        put_lin(f"{b}.feed_forward.intermediate_dense", layer["intermediate_dense"])
        put_lin(f"{b}.feed_forward.output_dense", layer["output_dense"])
        put_ln(f"{b}.final_layer_norm", layer["final_layer_norm"])

    if "masked_spec_embed" in p:
        sd["wav2vec2.masked_spec_embed"] = np.asarray(p["masked_spec_embed"])
    put_lin("lm_head", p["lm_head"])
    return sd


# --------------------------------------------------------------------------- #
# Factories (config surface of the reference's dnn_module group)
# --------------------------------------------------------------------------- #


def wav2vec2_for_ctc_from_pretrained(
    pretrained_model_name_or_path: str,
    pad_token_id: int = 35,
    vocab_size: int = 38,
    **config_overrides,
) -> Wav2Vec2ForCTC:
    """Load an HF checkpoint (hub or local cache) into the native model."""
    from transformers import Wav2Vec2Config as HFConfig
    import torch
    from transformers import Wav2Vec2ForCTC as TorchW2V2

    hf_cfg = HFConfig.from_pretrained(
        pretrained_model_name_or_path, pad_token_id=pad_token_id, vocab_size=vocab_size,
        **config_overrides,
    )
    config = Wav2Vec2Config(
        vocab_size=hf_cfg.vocab_size,
        pad_token_id=hf_cfg.pad_token_id,
        hidden_size=hf_cfg.hidden_size,
        num_hidden_layers=hf_cfg.num_hidden_layers,
        num_attention_heads=hf_cfg.num_attention_heads,
        intermediate_size=hf_cfg.intermediate_size,
        conv_dim=tuple(hf_cfg.conv_dim),
        conv_kernel=tuple(hf_cfg.conv_kernel),
        conv_stride=tuple(hf_cfg.conv_stride),
        conv_bias=hf_cfg.conv_bias,
        num_conv_pos_embeddings=hf_cfg.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=hf_cfg.num_conv_pos_embedding_groups,
        feat_extract_norm=hf_cfg.feat_extract_norm,
        do_stable_layer_norm=hf_cfg.do_stable_layer_norm,
        hidden_dropout=hf_cfg.hidden_dropout,
        attention_dropout=hf_cfg.attention_dropout,
        feat_proj_dropout=hf_cfg.feat_proj_dropout,
        final_dropout=hf_cfg.final_dropout,
        layerdrop=hf_cfg.layerdrop,
        apply_spec_augment=hf_cfg.apply_spec_augment,
        mask_time_prob=hf_cfg.mask_time_prob,
        mask_feature_prob=hf_cfg.mask_feature_prob,
        mask_feature_length=hf_cfg.mask_feature_length,
    )
    torch_model = TorchW2V2.from_pretrained(
        pretrained_model_name_or_path, pad_token_id=pad_token_id,
        vocab_size=vocab_size, **config_overrides,
    )
    sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}
    params = wav2vec2_params_from_torch(sd, config)
    return Wav2Vec2ForCTC(config, params=params)


def wav2vec2_for_ctc_from_config(
    pad_token_id: int = 35,
    vocab_size: int = 38,
    preset: Optional[str] = None,
    seed: int = 0,
    **config_overrides,
) -> Wav2Vec2ForCTC:
    """Random-init native model (offline path / tests)."""
    kwargs: Dict[str, Any] = {}
    if preset == "tiny":
        kwargs.update(TINY_W2V2_CONFIG)
    kwargs.update(config_overrides)
    config = Wav2Vec2Config(pad_token_id=pad_token_id, vocab_size=vocab_size, **kwargs)
    return Wav2Vec2ForCTC(config, seed=seed)
