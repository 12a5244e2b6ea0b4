"""Speech-to-phoneme task: wav2vec2-CTC fine-tuning (jit-compiled).

Re-design of ``Wav2Vec2ForSTPLightningModule``
(``lightning_modules/wav2vec2_for_stp.py:13-249``): one ``common_step``
shape for train/val/test; the CTC loss the reference gets from inside HF's
torch model becomes an explicit ``optax.ctc_loss`` with the pad token as
blank and 'mean' reduction (per-example loss / target length, averaged),
matching ``ctc_loss_reduction='mean'`` semantics; greedy argmax decode +
CER(PER) on the host.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

__all__ = ["Wav2Vec2STPTask", "STPTrainState"]


class STPTrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    rng: jax.Array


@dataclasses.dataclass
class Wav2Vec2STPTask:
    wav2vec2_for_ctc: Any  # FlaxWav2Vec2ForCTC (or a factory partial)
    optimizer: optax.GradientTransformation
    sample_rate: int = 16_000
    freeze_feature_encoder: bool = True
    description: Optional[str] = None
    tokenizer: Any = None  # wired by run.py / trainer from the datamodule
    accumulate_grad_batches: int = 1
    # optax.flatten the injected optimizer — exact only for elementwise
    # transforms; flips the opt-state checkpoint layout; default OFF since
    # round 3 (see tasks/eben.py::flatten_optimizer for the measurement)
    flatten_optimizer: bool = False
    # mixed precision: rebuild the model with a bf16 compute path (f32
    # master params; losses f32) — the trainer's ``precision`` knob sets this
    compute_dtype: "str | None" = None

    def __post_init__(self):
        if not hasattr(self.wav2vec2_for_ctc, "config") and callable(self.wav2vec2_for_ctc):
            self.wav2vec2_for_ctc = self.wav2vec2_for_ctc()
        if self.compute_dtype is not None:
            self.set_compute_dtype(self.compute_dtype)
        if not hasattr(self.optimizer, "init") and callable(self.optimizer):
            self.optimizer = self.optimizer()
        if self.accumulate_grad_batches > 1:
            self.optimizer = optax.MultiSteps(
                self.optimizer, every_k_schedule=self.accumulate_grad_batches
            )
        # single-flat-vector update (see eben.py: per-leaf op soup overhead)
        if self.flatten_optimizer:
            self.optimizer = optax.flatten(self.optimizer)
        self.blank_id = int(self.wav2vec2_for_ctc.config.pad_token_id)

    # tensor-parallel placements for the encoder projections over the mesh's
    # 'model' axis (Megatron column/row split — parallel/tp.py); applied by
    # DataParallel when the mesh has a real model axis, no-op otherwise
    @staticmethod
    def partition_spec_for_path(path_names, shape, model_size):
        from vibravox_tpu.parallel.tp import transformer_tp_spec

        return transformer_tp_spec(path_names, shape, model_size)

    def set_compute_dtype(self, dtype: "str | None") -> None:
        """Rebuild the flax module with the given compute dtype (the
        trainer's ``precision`` knob routes here before compilation)."""
        self.compute_dtype = dtype
        self._replace_config(compute_dtype=dtype)

    def configure_for_mesh(self, mesh) -> None:
        """Called by DataParallel before compilation: the SPMD-safe
        positional-conv vjp is only needed when the mesh has a model
        axis > 1 (its GSPMD dW bug scales with the model-axis size); on
        model==1 meshes the plain XLA backward is exact and ~33% faster
        at the recipe batch (see Wav2Vec2Config.spmd_safe_pos_conv)."""
        self._replace_config(
            spmd_safe_pos_conv=mesh.shape.get("model", 1) > 1
        )

    def _replace_config(self, **changes) -> None:
        import dataclasses as _dc

        from vibravox_tpu.models.wav2vec2 import Wav2Vec2ForCTCModule

        cfg = _dc.replace(self.wav2vec2_for_ctc.config, **changes)
        self.wav2vec2_for_ctc.config = cfg
        self.wav2vec2_for_ctc.module = Wav2Vec2ForCTCModule(cfg)

    # ------------------------------------------------------------------ #

    def initial_params(self):
        return self.wav2vec2_for_ctc.params

    def init_state_with_params(
        self, rng: jax.Array, example_batch: Dict[str, jnp.ndarray], params
    ) -> STPTrainState:
        """Init with pretrained params as a jit ARGUMENT (a jit of
        ``init_state`` would embed the ~95M-param model as program
        constants — overflows remote-compile transports)."""
        return STPTrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=self.optimizer.init(params),
            rng=rng,
        )

    def init_state(self, rng: jax.Array, example_batch: Dict[str, jnp.ndarray]) -> STPTrainState:
        params = self.wav2vec2_for_ctc.params
        return STPTrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=self.optimizer.init(params),
            rng=rng,
        )

    # ------------------------------------------------------------------ #

    def _ctc_loss(self, logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
        """'mean' CTC: per-example loss divided by target length, averaged.

        Uses the native CTC (``ops/ctc.py``, optax-parity-pinned): optax's
        scan stacks the full (T, B, N) alpha tables through per-iteration
        dynamic-update-slices, which measured 19.4 ms standalone at the
        recipe shapes on the v5e vs 1.1 ms for the carry-only native scan.
        ``VIBRAVOX_CTC_UNROLL`` tunes the scan unroll;
        ``VIBRAVOX_CTC_IMPL=optax`` falls back to optax.ctc_loss.
        """
        import os

        from vibravox_tpu.ops.ctc import ctc_loss

        label_paddings = (labels == -100).astype(jnp.float32)
        clean_labels = jnp.where(labels == -100, 0, labels)
        logit_paddings = jnp.zeros(logits.shape[:2], jnp.float32)
        if os.environ.get("VIBRAVOX_CTC_IMPL", "native") == "optax":
            per_example = optax.ctc_loss(
                logits, logit_paddings, clean_labels, label_paddings,
                blank_id=self.blank_id,
            )
        else:
            per_example = ctc_loss(
                logits, logit_paddings, clean_labels, label_paddings,
                blank_id=self.blank_id,
                unroll=int(os.environ.get("VIBRAVOX_CTC_UNROLL", "1")),
            )
        target_lengths = jnp.maximum(jnp.sum(1.0 - label_paddings, axis=-1), 1.0)
        return jnp.mean(per_example / target_lengths)

    def _forward(self, params, audio, train: bool, rng=None):
        out = self.wav2vec2_for_ctc(
            audio,
            params=params,
            dropout_rng=rng if train else None,
            train=train,
            freeze_feature_encoder=self.freeze_feature_encoder,
        )
        return out.logits

    # ------------------------------------------------------------------ #

    def train_step(
        self, state: STPTrainState, batch: Dict[str, jnp.ndarray]
    ) -> Tuple[STPTrainState, Dict[str, jnp.ndarray]]:
        rng, dropout_rng = jax.random.split(state.rng)

        def loss_fn(params):
            logits = self._forward(params, batch["audio"], train=True, rng=dropout_rng)
            return self._ctc_loss(logits, batch["phonemes_ids"])

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = self.optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state, rng=rng
        )
        return new_state, {"train/ctc_loss": loss}

    def eval_step(
        self, state: STPTrainState, batch: Dict[str, jnp.ndarray]
    ) -> Dict[str, jnp.ndarray]:
        logits = self._forward(state.params, batch["audio"], train=False)
        loss = self._ctc_loss(logits, batch["phonemes_ids"])
        return {
            "predictions": jnp.argmax(logits, axis=-1),
            "logs": {"ctc_loss": loss},
        }

    # ------------------------------------------------------------------ #

    def eval_metrics(self, outputs: Dict[str, Any]) -> Dict[str, float]:
        """Greedy decode + PER, host-side (ref ``common_logging``,
        ``wav2vec2_for_stp.py:176-226``)."""
        if self.tokenizer is None or "host" not in outputs:
            return {}
        from vibravox_tpu.metrics.text import char_error_rate

        preds = np.asarray(outputs["predictions"])
        decoded = self.tokenizer.batch_decode(preds)
        targets = outputs["host"].get("phonemes_str", [])
        if not targets:
            return {}
        # keep the last decode pair for text logging (ref logs predicted vs
        # target phoneme strings to TB — ``wav2vec2_for_stp.py:202-207``)
        self.last_decoded = (decoded[0], targets[0]) if decoded else None
        return {"char_error_rate": char_error_rate(decoded, list(targets))}
