"""Regressive Mimi BWE task: latent-space L1 fine-tuning of the codec encoder.

Mirrors ``RegressiveMimiLightningModule``
(``lightning_modules/regressive_mimi.py:13-97``): two copies of the Mimi
codec — a frozen reference and a trainable one; only the trainable
encoder + encoder_transformer + downsample receive gradients (decoder and
quantizer stay frozen); the loss is L1 between the *unquantized* latents of
the corrupted (trainable) and reference (frozen) audio; eval decodes the
corrupted latents through the RVQ for the SE metric suite; 24 kHz only;
inputs padded to multiples of the 1920-sample frame.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import flax.traverse_util
import jax
import jax.numpy as jnp
import optax

from vibravox_tpu.models.mimi.mimi import Mimi

__all__ = ["RegressiveMimiTask", "MimiTrainState"]

_TRAINABLE_PREFIXES = ("encoder", "encoder_transformer", "downsample")


class MimiTrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any  # trainable mimi params (full tree; only prefixes update)
    opt_state: Any
    rng: jax.Array
    # frozen copy of the *encoder-side* pretrained params (the regressive
    # target's whole dependency — ref regressive_mimi.py:24-38).  Lives in
    # the state rather than as a jit-captured constant: embedding ~80M f32
    # constants in the program overflows remote-compile transports
    frozen_params: Any = None


@dataclasses.dataclass
class RegressiveMimiTask:
    mimi: Mimi
    optimizer: optax.GradientTransformation
    sample_rate: int = 24000
    description: Optional[str] = None

    def __post_init__(self):
        assert self.sample_rate == 24000, (
            "RegressiveMimi runs at 24 kHz only (ref regressive_mimi.py:21)"
        )
        if not hasattr(self.mimi, "module") and callable(self.mimi):
            self.mimi = self.mimi()
        if not hasattr(self.optimizer, "init") and callable(self.optimizer):
            self.optimizer = self.optimizer()
        # only encoder-side params train (ref regressive_mimi.py:32-38).
        # Two equivalent implementations (tests/test_mimi.py pins them equal):
        #   default — optax.multi_transform over the FULL tree with
        #   set_to_zero on frozen leaves.  The zero updates are NOT free:
        #   apply_updates adds +0.0 to every frozen f32 leaf, and XLA cannot
        #   fold add(x, +0.0) under IEEE (-0+0 = +0), so the ~55M frozen
        #   decoder/quantizer params are read+written every step.
        #   VIBRAVOX_MIMI_SUBTREE_OPT=1 — differentiate and update ONLY the
        #   encoder-side subtree; frozen leaves pass through the (donated)
        #   state untouched.  Changes the opt_state pytree layout (no adam
        #   slots for frozen leaves), so checkpoints are not interchangeable
        #   across the flag.
        import os

        self._subtree_opt = os.environ.get("VIBRAVOX_MIMI_SUBTREE_OPT", "0") == "1"
        if not self._subtree_opt:
            self.optimizer = optax.multi_transform(
                {"train": self.optimizer, "freeze": optax.set_to_zero()},
                param_labels=self._param_labels,
            )
        from vibravox_tpu.tasks.se_metrics import SEMetrics

        self._se_metrics = SEMetrics(self.sample_rate)

    # tensor-parallel placements for the bottleneck transformers' projections
    # over the mesh's 'model' axis (parallel/tp.py); the SEANet conv trunks
    # stay replicated (small channel counts)
    @staticmethod
    def partition_spec_for_path(path_names, shape, model_size):
        from vibravox_tpu.parallel.tp import transformer_tp_spec

        return transformer_tp_spec(path_names, shape, model_size)

    @staticmethod
    def _param_labels(params):
        flat = flax.traverse_util.flatten_dict(params)
        labels = {
            k: ("train" if any(k[1].startswith(p) for p in _TRAINABLE_PREFIXES) else "freeze")
            for k in flat
        }
        return flax.traverse_util.unflatten_dict(labels)

    def eval_metrics(self, outputs) -> Dict[str, float]:
        return self._se_metrics(outputs)

    # ------------------------------------------------------------------ #

    def pad_to_frame(self, audio: jnp.ndarray) -> jnp.ndarray:
        """Right-pad the time axis to a multiple of 1920 (ref ``91-97``)."""
        t = audio.shape[1]
        target = self.mimi.valid_length(t)
        return jnp.pad(audio, ((0, 0), (0, target - t), (0, 0)))

    @staticmethod
    def _encoder_side(params: Any) -> Any:
        """Subtree feeding ``encode_to_latent`` (the frozen target path)."""
        inner = params["params"] if "params" in params else params
        return {"params": {k: inner[k] for k in inner if any(
            k.startswith(p) for p in _TRAINABLE_PREFIXES
        )}}

    @staticmethod
    def _split_trainable(params: Any):
        """(wrapped?, inner dict, trainable-subtree dict) of a params tree."""
        wrapped = "params" in params
        inner = params["params"] if wrapped else params
        tr = {k: v for k, v in inner.items() if any(
            k.startswith(p) for p in _TRAINABLE_PREFIXES
        )}
        return wrapped, inner, tr

    @staticmethod
    def _merge_trainable(wrapped: bool, inner: Any, tr: Any) -> Any:
        merged = {**inner, **tr}
        return {"params": merged} if wrapped else merged

    def initial_params(self) -> Any:
        return self.mimi.params

    def init_state_with_params(
        self, rng: jax.Array, example_batch: Dict[str, jnp.ndarray], params: Any
    ) -> MimiTrainState:
        """Init with the pretrained params passed as a jit ARGUMENT — jitting
        ``init_state`` directly would embed them as program constants."""
        if self._subtree_opt:
            _, _, tr = self._split_trainable(params)
            opt_state = self.optimizer.init(tr)
        else:
            opt_state = self.optimizer.init(params)
        return MimiTrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=opt_state,
            rng=rng,
            frozen_params=self._encoder_side(params),
        )

    def init_state(self, rng: jax.Array, example_batch: Dict[str, jnp.ndarray]) -> MimiTrainState:
        return self.init_state_with_params(rng, example_batch, self.mimi.params)

    # ------------------------------------------------------------------ #

    def train_step(
        self, state: MimiTrainState, batch: Dict[str, jnp.ndarray]
    ) -> Tuple[MimiTrainState, Dict[str, jnp.ndarray]]:
        corrupted = self.pad_to_frame(batch["audio_body_conducted"])
        reference = self.pad_to_frame(batch["audio_airborne"])
        # frozen copy: the *initial* pretrained params, carried in the state
        frozen = state.frozen_params if state.frozen_params is not None else self.mimi.params
        target_latent = jax.lax.stop_gradient(
            self.mimi.encode_to_latent(reference, params=frozen)
        )

        if self._subtree_opt:
            # grads + adam over the encoder-side subtree only; frozen leaves
            # flow through the donated state with zero arithmetic or HBM
            # traffic (see __post_init__)
            wrapped, inner, tr = self._split_trainable(state.params)

            def loss_fn(tr):
                merged = self._merge_trainable(wrapped, inner, tr)
                latent = self.mimi.encode_to_latent(corrupted, params=merged)
                return jnp.mean(jnp.abs(latent - target_latent))

            loss, grads = jax.value_and_grad(loss_fn)(tr)
            updates, opt_state = self.optimizer.update(grads, state.opt_state, tr)
            params = self._merge_trainable(
                wrapped, inner, optax.apply_updates(tr, updates)
            )
        else:

            def loss_fn(params):
                latent = self.mimi.encode_to_latent(corrupted, params=params)
                return jnp.mean(jnp.abs(latent - target_latent))

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            updates, opt_state = self.optimizer.update(
                grads, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
        return (
            state.replace(step=state.step + 1, params=params, opt_state=opt_state),
            {"train/l1_latent_loss": loss},
        )

    def eval_step(
        self, state: MimiTrainState, batch: Dict[str, jnp.ndarray]
    ) -> Dict[str, jnp.ndarray]:
        """Decode corrupted latents through the RVQ (ref ``57-74``)."""
        corrupted = self.pad_to_frame(batch["audio_body_conducted"])
        latent = self.mimi.encode_to_latent(corrupted, params=state.params)
        enhanced = self.mimi.decode_latent(latent, params=state.params)
        outputs: Dict[str, Any] = {"corrupted": corrupted, "enhanced": enhanced, "logs": {}}
        if "audio_airborne" in batch:
            reference = self.pad_to_frame(batch["audio_airborne"])
            outputs["reference"] = reference
            frozen = state.frozen_params if state.frozen_params is not None else self.mimi.params
            target_latent = self.mimi.encode_to_latent(reference, params=frozen)
            outputs["logs"] = {
                "l1_latent_loss": jnp.mean(jnp.abs(latent - target_latent))
            }
        return outputs
