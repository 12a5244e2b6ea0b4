"""Speaker-verification eval task (inference-only).

Mirrors ``ECAPA2LightningModule`` (``lightning_modules/ecapa2.py:22-224``):
no-op train/val; the test loop embeds both sides of each trial pair with a
jitted embedder, L2-normalizes, accumulates cosine similarity / euclidean
distance / same-speaker labels across the epoch, and computes EER, minDCF
and embedding-distance statistics at epoch end.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from vibravox_tpu.metrics.verification import (
    BinaryScoreAccumulator,
    embedding_distance_stats,
    equal_error_rate,
    minimum_detection_cost,
)

__all__ = ["SPKVTask", "SPKVState"]


class SPKVState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    rng: jax.Array


@dataclasses.dataclass
class SPKVTask:
    embedder: Any  # flax module: (B, T) waveform -> (B, D) embedding
    sample_rate: int = 16_000
    params: Optional[Any] = None  # pretrained/converted weights
    # torch state-dict file (converter layout of models/ecapa2.py); defaults
    # to $VIBRAVOX_ECAPA2_CKPT — the reference's pretrained-embedder slot
    # (ecapa2.py:38-40 loads the Jenthe/ECAPA2 archive)
    checkpoint_path: Optional[str] = None
    mindcf_p_target: float = 0.05
    mindcf_c_fa: float = 1.0
    mindcf_c_fr: float = 1.0
    description: Optional[str] = None

    def __post_init__(self):
        assert self.sample_rate == 16_000, "SPKV eval runs at 16 kHz (ref ecapa2.py:33-35)"
        self._cosine_acc = BinaryScoreAccumulator()
        self._euclid_acc = BinaryScoreAccumulator()

    # ------------------------------------------------------------------ #

    def _load_checkpoint_params(self) -> Optional[Any]:
        import os

        path = self.checkpoint_path or os.environ.get("VIBRAVOX_ECAPA2_CKPT")
        if not path:
            return None
        import torch

        from vibravox_tpu.models.ecapa2 import ecapa2_params_from_torchscript

        obj = torch.load(path, map_location="cpu", weights_only=False)
        if hasattr(obj, "state_dict"):
            obj = obj.state_dict()
        sd = {k: np.asarray(v) for k, v in obj.items()}
        config = getattr(self.embedder, "config", None)
        kwargs = {"config": config} if config is not None else {}
        return jax.tree_util.tree_map(jnp.asarray,
                                      ecapa2_params_from_torchscript(sd, **kwargs))

    def init_state(self, rng: jax.Array, example_batch: Dict) -> SPKVState:
        params = self.params
        if params is None:
            params = self._load_checkpoint_params()
        if params is None:
            t = example_batch["sensor_a"]["audio"].shape[-1] if "sensor_a" in example_batch else 16000
            params = self.embedder.init(rng, jnp.zeros((1, int(t))))
        return SPKVState(step=jnp.zeros((), jnp.int32), params=params, rng=rng)

    def train_step(self, state: SPKVState, batch) -> Tuple[SPKVState, Dict]:
        return state, {}  # no-op (ref ``ecapa2.py:58-75``)

    # ------------------------------------------------------------------ #

    def eval_step(self, state: SPKVState, batch: Dict) -> Dict:
        """Embed both pair sides and L2-normalize (ref ``ecapa2.py:102-116``)."""
        emb_a = self.embedder.apply(state.params, batch["sensor_a_audio"])
        emb_b = self.embedder.apply(state.params, batch["sensor_b_audio"])
        emb_a = emb_a / jnp.linalg.norm(emb_a, axis=-1, keepdims=True)
        emb_b = emb_b / jnp.linalg.norm(emb_b, axis=-1, keepdims=True)
        cosine = jnp.sum(emb_a * emb_b, axis=-1)
        euclidean = jnp.linalg.norm(emb_a - emb_b, axis=-1)
        return {"cosine": cosine, "euclidean": euclidean, "logs": {}}

    def prepare_eval_batch(self, batch: Dict) -> Dict:
        """Flatten the paired structure into jit-able arrays + host metadata."""
        return {
            "sensor_a_audio": batch["sensor_a"]["audio"],
            "sensor_b_audio": batch["sensor_b"]["audio"],
            "speaker_a": batch["sensor_a"]["speaker_id"],
            "speaker_b": batch["sensor_b"]["speaker_id"],
        }

    def on_eval_batch_end(self, outputs: Dict) -> None:
        """Accumulate scores + labels (ref ``on_test_batch_end``,
        ``ecapa2.py:138-188``)."""
        host = outputs.get("host", {})
        speakers_a = host.get("speaker_a", [])
        speakers_b = host.get("speaker_b", [])
        labels = np.asarray(
            [a == b for a, b in zip(speakers_a, speakers_b)], dtype=np.int32
        )
        self._cosine_acc.update(np.asarray(outputs["cosine"], np.float32), labels)
        self._euclid_acc.update(np.asarray(outputs["euclidean"], np.float32), labels)

    def on_eval_epoch_end(self) -> Dict[str, float]:
        """EER / minDCF / embedding stats (ref ``on_test_epoch_end``,
        ``ecapa2.py:190-201``)."""
        cosine, labels = self._cosine_acc.compute()
        euclid, _ = self._euclid_acc.compute()
        eer = equal_error_rate(cosine, labels)
        dcf = minimum_detection_cost(
            cosine, labels, self.mindcf_p_target, self.mindcf_c_fa, self.mindcf_c_fr
        )
        cos_stats = embedding_distance_stats(cosine, labels)
        euc_stats = embedding_distance_stats(euclid, labels)
        metrics = {
            "equal_error_rate": eer["eer"],
            "eer_threshold": eer["threshold"],
            "minimum_dcf": dcf["min_dcf"],
        }
        metrics.update({f"cosine_{k}": v for k, v in cos_stats.items()})
        metrics.update({f"euclidean_{k}": v for k, v in euc_stats.items()})
        self._cosine_acc.reset()
        self._euclid_acc.reset()
        return metrics
