"""SQUIM predictor networks (objective + subjective), TPU-native.

The reference evaluates reference-free speech quality with torchaudio's
pretrained SQUIM pipelines (``/root/reference/vibravox/metrics/
torchsquim_stoi.py:38`` uses ``SQUIM_OBJECTIVE``, ``noresqa_mos.py:32`` uses
``SQUIM_SUBJECTIVE``; both are consumed at ``lightning_modules/
base_se.py:87-99``).  torchaudio is not importable offline, so these modules
re-implement the two architectures natively in flax:

* ``SquimObjective`` — the TorchAudio-SQUIM objective model (Kumar et al.,
  ICASSP 2023): learned filterbank encoder → dual-path RNN (DPRNN, Luo et
  al. 2020) → three transformer+AutoPool branches predicting STOI, PESQ and
  SI-SDR from the degraded signal alone.
* ``SquimSubjective`` — NORESQA-MOS (Manocha & Kumar, 2022): a wav2vec2
  SSL backbone encodes both the test signal and a *non-matching* reference;
  concatenated features go through a projector and an attention-pooled MOS
  head.

Layer inventory and hyper-parameters follow the published TorchAudio-SQUIM
description; dims that the paper leaves open are constructor arguments and
the torch converters (``squim_*_params_from_torch``) infer them from
checkpoint tensor shapes, so a pretrained state dict can be ingested the
moment network access exists and any topology mismatch fails loudly with a
key/shape diff instead of silently mis-mapping.

Everything is channels-last ``(B, T, C)`` and jit-compatible; the LSTMs use
``flax.linen`` scan-based RNNs (eval-only metric nets — sequential scan is
fine off the training hot path).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vibravox_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2ForCTCModule

__all__ = [
    "SquimObjective",
    "SquimSubjective",
    "squim_objective_base",
    "squim_subjective_base",
    "squim_objective_params_from_torch",
    "squim_subjective_params_from_torch",
]


# --------------------------------------------------------------------------- #
# shared pieces
# --------------------------------------------------------------------------- #


def _range_sigmoid(x: jnp.ndarray, lo: float, hi: float) -> jnp.ndarray:
    return jax.nn.sigmoid(x) * (hi - lo) + lo


class AutoPool(nn.Module):
    """Adaptive softmax pooling over time with a learned temperature ``alpha``
    (torchaudio ``squim/objective.py`` AutoPool; McFee et al. 2018)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (B, T, C) -> (B, C)
        alpha = self.param("alpha", nn.initializers.ones, (1,))
        weight = jax.nn.softmax(x * alpha, axis=1)
        return jnp.sum(x * weight, axis=1)


class AttPool(nn.Module):
    """Attention pooling + projection (torchaudio ``squim/subjective.py``)."""

    att_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (B, T, C) -> (B, att_dim)
        att = nn.Dense(1, name="linear1")(x)  # (B, T, 1)
        att = jax.nn.softmax(jnp.swapaxes(att, 1, 2), axis=2)  # (B, 1, T)
        pooled = jnp.matmul(att, x)[:, 0]  # (B, C)
        return nn.Dense(self.att_dim, name="linear2")(pooled)


class TorchTransformerEncoderLayer(nn.Module):
    """``torch.nn.TransformerEncoderLayer`` semantics (post-norm, ReLU,
    packed q/k/v projection) so converted weights map one-to-one."""

    d_model: int
    nhead: int
    dim_feedforward: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (B, T, E)
        e = self.d_model
        qkv = nn.Dense(3 * e, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            b, tt, _ = t.shape
            return t.reshape(b, tt, self.nhead, e // self.nhead)

        attn = jax.nn.dot_product_attention(heads(q), heads(k), heads(v))
        attn = attn.reshape(x.shape)
        attn = nn.Dense(e, name="out_proj")(attn)
        x = nn.LayerNorm(name="norm1")(x + attn)
        h = nn.Dense(self.dim_feedforward, name="linear1")(x)
        h = nn.Dense(e, name="linear2")(jax.nn.relu(h))
        return nn.LayerNorm(name="norm2")(x + h)


# --------------------------------------------------------------------------- #
# objective model (waveform -> [stoi, pesq, si-sdr])
# --------------------------------------------------------------------------- #


class SingleRNN(nn.Module):
    """Bidirectional single-layer LSTM + linear projection back to the input
    width (torchaudio ``squim/objective.py`` SingleRNN)."""

    input_size: int
    hidden_size: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (B, T, N) -> (B, T, N)
        hf = nn.RNN(nn.OptimizedLSTMCell(self.hidden_size, name="cell_fwd"))(x)
        hb = nn.RNN(
            nn.OptimizedLSTMCell(self.hidden_size, name="cell_bwd"),
            reverse=True,
            keep_order=True,
        )(x)
        h = jnp.concatenate([hf, hb], axis=-1)  # (B, T, 2H), torch direction order
        return nn.Dense(self.input_size, name="proj")(h)


def _chunk(x: jnp.ndarray, chunk: int) -> Tuple[jnp.ndarray, int]:
    """Split (B, T, N) into 50 %-overlapped chunks -> (B, S, chunk, N).

    The standard dual-path segmentation (chunk_stride = chunk // 2): pad the
    tail so splitting works, pad ``stride`` on both ends, then interleave the
    two half-offset chunkings.
    """
    b, t, n = x.shape
    stride = chunk // 2
    gap = (chunk - (stride + t % chunk) % chunk) % chunk
    x = jnp.pad(x, ((0, 0), (stride, stride + gap), (0, 0)))
    c1 = x[:, :-stride].reshape(b, -1, chunk, n)
    c2 = x[:, stride:].reshape(b, -1, chunk, n)
    out = jnp.stack([c1, c2], axis=2).reshape(b, -1, chunk, n)
    return out, gap


def _merge(x: jnp.ndarray, gap: int, chunk: int) -> jnp.ndarray:
    """Inverse of :func:`_chunk` by overlap-add: (B, S, chunk, N) -> (B, T, N)."""
    b, s, _, n = x.shape
    stride = chunk // 2
    x = x.reshape(b, s // 2, 2 * chunk, n)
    o1 = x[:, :, :chunk].reshape(b, -1, n)[:, stride:]
    o2 = x[:, :, chunk:].reshape(b, -1, n)[:, :-stride]
    out = o1 + o2
    if gap > 0:
        out = out[:, :-gap]
    return out


class DPRNN(nn.Module):
    """Dual-path RNN over chunked features (torchaudio ``squim/objective.py``
    DPRNN): per-block intra-chunk and inter-chunk bi-LSTMs with GroupNorm(1)
    residuals, then a 1x1 conv + PReLU to ``d_model`` and overlap-add."""

    feat_dim: int
    hidden_dim: int
    num_blocks: int
    d_model: int
    chunk_size: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (B, T, N) -> (B, T', d_model)
        chunks, gap = _chunk(x, self.chunk_size)  # (B, S, K, N)
        b, s, k, n = chunks.shape
        out = chunks
        for i in range(self.num_blocks):
            row_in = out.reshape(b * s, k, n)
            row = SingleRNN(n, self.hidden_dim, name=f"row_rnn_{i}")(row_in)
            row = row.reshape(b, s, k, n)
            row = nn.GroupNorm(num_groups=1, epsilon=1e-8, name=f"row_norm_{i}")(row)
            out = out + row
            col_in = jnp.swapaxes(out, 1, 2).reshape(b * k, s, n)
            col = SingleRNN(n, self.hidden_dim, name=f"col_rnn_{i}")(col_in)
            col = jnp.swapaxes(col.reshape(b, k, s, n), 1, 2)
            col = nn.GroupNorm(num_groups=1, epsilon=1e-8, name=f"col_norm_{i}")(col)
            out = out + col
        out = nn.Dense(self.d_model, name="conv")(out)  # 1x1 Conv2d == Dense on N
        out = nn.PReLU(name="prelu")(out)
        return _merge(out, gap, self.chunk_size)


class ObjectiveBranch(nn.Module):
    """One metric head: transformer layer -> AutoPool -> MLP (+ optional
    range sigmoid for bounded metrics)."""

    d_model: int
    nhead: int
    val_range: Tuple[float, float] | None  # None = unbounded (SI-SDR)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (B, T, E) -> (B,)
        h = TorchTransformerEncoderLayer(
            self.d_model, self.nhead, 4 * self.d_model, name="transformer"
        )(x)
        h = AutoPool(name="pool")(h)
        h = nn.Dense(self.d_model, name="linear1")(h)
        h = nn.PReLU(name="prelu")(h)
        h = nn.Dense(1, name="linear2")(h)[:, 0]
        if self.val_range is not None:
            h = _range_sigmoid(h, *self.val_range)
        return h


@dataclasses.dataclass(frozen=True)
class SquimObjectiveConfig:
    feat_dim: int = 256
    win_len: int = 64
    d_model: int = 256
    nhead: int = 4
    hidden_dim: int = 256
    num_blocks: int = 2
    chunk_size: int = 71
    # (metric name, output range or None) per branch, in pipeline order
    branches: Tuple[Tuple[str, Tuple[float, float] | None], ...] = (
        ("stoi", (0.0, 1.0)),
        ("pesq", (1.0, 4.5)),
        ("sisdr", None),
    )


class SquimObjective(nn.Module):
    """Waveform (B, T) -> tuple of (B,) scores [stoi, pesq, si-sdr]."""

    config: SquimObjectiveConfig = SquimObjectiveConfig()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        cfg = self.config
        if x.ndim != 2:
            raise ValueError(f"expected (batch, time) waveform, got {x.shape}")
        # input scaling: RMS normalised to 1/20 (torchaudio SquimObjective.forward)
        x = x / (jnp.sqrt(jnp.mean(x**2, axis=1, keepdims=True)) * 20.0)
        # learned filterbank encoder: Conv1d(1, feat_dim, win_len, stride=win//2)
        h = nn.Conv(
            cfg.feat_dim,
            (cfg.win_len,),
            strides=(cfg.win_len // 2,),
            padding="VALID",
            use_bias=False,
            name="encoder",
        )(x[:, :, None])
        h = jax.nn.relu(h)
        h = DPRNN(
            cfg.feat_dim, cfg.hidden_dim, cfg.num_blocks, cfg.d_model,
            cfg.chunk_size, name="dprnn",
        )(h)
        return tuple(
            ObjectiveBranch(cfg.d_model, cfg.nhead, rng_, name=f"branch_{name}")(h)
            for name, rng_ in cfg.branches
        )


def squim_objective_base() -> SquimObjective:
    """The SQUIM_OBJECTIVE pipeline architecture (torchaudio
    ``squim_objective_base()``: feat 256, win 64, d_model 256, 4 heads,
    hidden 256, 2 DPRNN blocks, LSTM, chunk 71)."""
    return SquimObjective(SquimObjectiveConfig())


# --------------------------------------------------------------------------- #
# subjective model (test waveform + non-matching reference -> MOS)
# --------------------------------------------------------------------------- #


@dataclasses.dataclass(frozen=True)
class SquimSubjectiveConfig:
    proj_dim: int = 512
    att_dim: int = 512
    ssl: Wav2Vec2Config = Wav2Vec2Config(
        vocab_size=1, apply_spec_augment=False, layerdrop=0.0
    )


class SquimSubjective(nn.Module):
    """NORESQA-MOS: MOS of ``estimate`` judged against a *non-matching*
    reference signal.  (B, T) x (B, Tr) -> (B,)."""

    config: SquimSubjectiveConfig = SquimSubjectiveConfig()

    def _align(self, estimate: jnp.ndarray, reference: jnp.ndarray) -> jnp.ndarray:
        """Tile/crop the reference to the estimate's length (torchaudio
        ``SquimSubjective._align_shapes``)."""
        t = estimate.shape[1]
        reps = -(-t // reference.shape[1])
        return jnp.tile(reference, (1, reps))[:, :t]

    @nn.compact
    def __call__(self, estimate: jnp.ndarray, reference: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        reference = self._align(estimate, reference)
        ssl = Wav2Vec2ForCTCModule(cfg.ssl, name="ssl")
        feat_e = ssl(estimate, return_features=True)  # (B, T', 768)
        feat_r = ssl(reference, return_features=True)
        h = jnp.concatenate([feat_r, feat_e], axis=-1)  # (B, T', 1536)
        h = nn.Dense(cfg.proj_dim, name="projector")(h)
        h = AttPool(cfg.att_dim, name="att_pool")(h)
        return nn.Dense(1, name="mos_head")(h)[:, 0]


def squim_subjective_base() -> SquimSubjective:
    """The SQUIM_SUBJECTIVE pipeline architecture: wav2vec2-base SSL backbone
    + projector + attention-pooled MOS head."""
    return SquimSubjective(SquimSubjectiveConfig())


# --------------------------------------------------------------------------- #
# torch converters
# --------------------------------------------------------------------------- #


def _lin(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    out = {"kernel": np.asarray(sd.pop(f"{prefix}.weight")).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd.pop(f"{prefix}.bias"))
    return out


def _norm(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {
        "scale": np.asarray(sd.pop(f"{prefix}.weight")),
        "bias": np.asarray(sd.pop(f"{prefix}.bias")),
    }


def _bilstm(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, Any]:
    """torch bidirectional LSTM -> flax Bidirectional(RNN(OptimizedLSTMCell)).

    torch packs gate rows (i, f, g, o) in ``weight_ih_l0`` (4H, in) /
    ``weight_hh_l0`` (4H, H) with two bias vectors; flax OptimizedLSTMCell
    keeps per-gate Dense params ``i{i,f,g,o}`` (kernel only) and
    ``h{i,f,g,o}`` (kernel + bias) — so the map is a row-chunked transpose
    with the two torch biases summed onto the ``h*`` biases.
    """

    def direction(suffix: str) -> Dict[str, Any]:
        w_ih = np.asarray(sd.pop(f"{prefix}.weight_ih_l0{suffix}"))
        w_hh = np.asarray(sd.pop(f"{prefix}.weight_hh_l0{suffix}"))
        b = np.asarray(sd.pop(f"{prefix}.bias_ih_l0{suffix}")) + np.asarray(
            sd.pop(f"{prefix}.bias_hh_l0{suffix}")
        )
        h = w_hh.shape[1]
        cell: Dict[str, Any] = {}
        for gi, gate in enumerate(("i", "f", "g", "o")):
            rows = slice(gi * h, (gi + 1) * h)
            cell[f"i{gate}"] = {"kernel": w_ih[rows].T}
            cell[f"h{gate}"] = {"kernel": w_hh[rows].T, "bias": b[rows]}
        return cell

    return {"cell_fwd": direction(""), "cell_bwd": direction("_reverse")}


def _single_rnn(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, Any]:
    # the flax cells live directly in the SingleRNN scope (no "rnn" level)
    out = _bilstm(sd, f"{prefix}.rnn")
    out["proj"] = _lin(sd, f"{prefix}.proj")
    return out


def _transformer_layer(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, Any]:
    return {
        "in_proj": {
            "kernel": np.asarray(sd.pop(f"{prefix}.self_attn.in_proj_weight")).T,
            "bias": np.asarray(sd.pop(f"{prefix}.self_attn.in_proj_bias")),
        },
        "out_proj": _lin(sd, f"{prefix}.self_attn.out_proj"),
        "linear1": _lin(sd, f"{prefix}.linear1"),
        "linear2": _lin(sd, f"{prefix}.linear2"),
        "norm1": _norm(sd, f"{prefix}.norm1"),
        "norm2": _norm(sd, f"{prefix}.norm2"),
    }


def squim_objective_params_from_torch(
    state_dict: Dict[str, np.ndarray], config: SquimObjectiveConfig = SquimObjectiveConfig()
) -> Dict[str, Any]:
    """Map a torchaudio ``SquimObjective`` state dict onto :class:`SquimObjective`.

    Consumes keys destructively and raises with the leftover inventory on any
    mismatch, so a topology drift in the reconstruction fails loudly.
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    params: Dict[str, Any] = {}
    # torch Conv1d weight (out, 1, k) -> flax Conv kernel (k, 1, out)
    params["encoder"] = {
        "kernel": np.transpose(sd.pop("encoder.conv1d.weight"), (2, 1, 0))
    }
    dprnn: Dict[str, Any] = {}
    for i in range(config.num_blocks):
        dprnn[f"row_rnn_{i}"] = _single_rnn(sd, f"dprnn.row_rnn.{i}")
        dprnn[f"col_rnn_{i}"] = _single_rnn(sd, f"dprnn.col_rnn.{i}")
        dprnn[f"row_norm_{i}"] = _norm(sd, f"dprnn.row_norm.{i}")
        dprnn[f"col_norm_{i}"] = _norm(sd, f"dprnn.col_norm.{i}")
    # Conv2d(feat, d_model, 1) -> Dense: weight (d_model, feat, 1, 1)
    dprnn["conv"] = {
        "kernel": np.asarray(sd.pop("dprnn.conv.0.weight"))[:, :, 0, 0].T,
        "bias": np.asarray(sd.pop("dprnn.conv.0.bias")),
    }
    dprnn["prelu"] = {
        "negative_slope": np.asarray(sd.pop("dprnn.conv.1.weight")).reshape(())
    }
    params["dprnn"] = dprnn
    for bi, (name, rng_) in enumerate(config.branches):
        branch = {
            "transformer": _transformer_layer(sd, f"branches.{bi}.0"),
            "pool": {"alpha": np.asarray(sd.pop(f"branches.{bi}.1.alpha"))},
            "linear1": _lin(sd, f"branches.{bi}.2.0"),
            "prelu": {
                "negative_slope": np.asarray(sd.pop(f"branches.{bi}.2.1.weight")).reshape(())
            },
            "linear2": _lin(sd, f"branches.{bi}.2.2"),
        }
        params[f"branch_{name}"] = branch
    if sd:
        raise ValueError(
            "unconsumed torch keys (topology drift between the checkpoint and "
            f"this reconstruction): {sorted(sd)[:20]}"
        )
    return {"params": params}


def _torchaudio_w2v2_to_hf(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Rename a ``torchaudio.models.Wav2Vec2Model`` state dict to the HF
    ``Wav2Vec2ForCTC`` naming that :func:`wav2vec2_params_from_torch` expects.

    torchaudio nests the transformer under ``encoder.transformer`` and the
    feature projection under ``encoder.feature_projection``; HF flattens both
    under ``wav2vec2.`` with the projection at top level.
    """
    out: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k.startswith("feature_extractor."):
            out["wav2vec2." + k] = v
        elif k.startswith("encoder.feature_projection."):
            out["wav2vec2.feature_projection." + k[len("encoder.feature_projection."):]] = v
        elif k.startswith("encoder.transformer."):
            out["wav2vec2.encoder." + k[len("encoder.transformer."):]] = v
        else:
            raise ValueError(f"unrecognised torchaudio wav2vec2 key: {k}")
    return out


def squim_subjective_params_from_torch(
    state_dict: Dict[str, np.ndarray], config: SquimSubjectiveConfig = SquimSubjectiveConfig()
) -> Dict[str, Any]:
    """Map a torchaudio ``SquimSubjective`` state dict onto :class:`SquimSubjective`.

    The SSL backbone reuses :func:`wav2vec2_params_from_torch` through a
    torchaudio->HF key renamer; head dims are read from the checkpoint shapes
    (the paper leaves them open), so the caller should rebuild the module
    with the returned config if it differs.
    """
    from vibravox_tpu.models.wav2vec2 import wav2vec2_params_from_torch

    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    ssl_sd = {
        k[len("ssl_model."):]: v for k, v in sd.items() if k.startswith("ssl_model.")
    }
    head_sd = {k: v for k, v in sd.items() if not k.startswith("ssl_model.")}
    ssl_sd = _torchaudio_w2v2_to_hf(ssl_sd)
    # the SSL backbone has no CTC head; satisfy the converter with zeros
    # (never used: the subjective model reads features, not logits)
    ssl_sd.setdefault("lm_head.weight", np.zeros((config.ssl.vocab_size, config.ssl.hidden_size), np.float32))
    ssl_sd.setdefault("lm_head.bias", np.zeros((config.ssl.vocab_size,), np.float32))
    ssl_params = wav2vec2_params_from_torch(ssl_sd, config.ssl)
    params: Dict[str, Any] = {"ssl": ssl_params}
    params["projector"] = _lin(head_sd, "projector")
    params["att_pool"] = {
        "linear1": _lin(head_sd, "predictor.att_pool_layer.linear1"),
        "linear2": _lin(head_sd, "predictor.att_pool_layer.linear2"),
    }
    params["mos_head"] = _lin(head_sd, "predictor.mos_layer")
    if head_sd:
        raise ValueError(f"unconsumed torch keys: {sorted(head_sd)[:20]}")
    return {"params": params}
