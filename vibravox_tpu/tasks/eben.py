"""EBEN GAN training task: jit-compiled train/eval steps.

TPU-native re-design of the reference's Lightning module with manual
optimization (``vibravox/lightning_modules/eben.py:9-240``):

  * one ``train_step(state, batch) -> (state, logs)`` pure function, fully
    jit-compiled and donate-able, replacing the generator-then-discriminator
    manual optimization sequence;
  * dynamic loss balancing: per-atomic-loss gradient norms w.r.t. the
    generator's last conv kernel (the reference's ``autograd.grad(loss,
    last_conv.weight, retain_graph=True)`` — ``eben.py:222-240``) become one
    ``jax.jacrev`` of the stacked atomic losses w.r.t. that kernel, taken
    through the generator *tail* only (last conv → tanh → synthesis →
    discriminator) so the encoder/decoder are not re-traversed;
  * EMA of the norms is carried in the train state (not a python-side
    attribute), β and the simple/ema/none mode per the reference;
  * the discriminator step reuses the generator-step outputs through
    ``stop_gradient`` (the reference's ``.detach()`` — ``eben.py:213-217``)
    and is gated by a Bernoulli draw with ``update_discriminator_ratio``;
  * both Adam updates run inside the same jit; the discriminator update is
    selected with a mask so the compiled step has a single static shape.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from vibravox_tpu.models.eben_discriminator import DiscriminatorEBENMultiScales
from vibravox_tpu.models.eben_generator import EBENGenerator

__all__ = ["EBENTask", "EBENTrainState"]


class EBENTrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    gen_params: Any
    disc_params: Any
    gen_opt_state: Any
    disc_opt_state: Any
    atomic_norms_ema: jnp.ndarray  # (n_atomic_losses,)
    rng: jax.Array


@dataclasses.dataclass
class EBENTask:
    """Bundles networks, losses, optimizers and the compiled step functions.

    Mirrors the constructor surface of ``EBENLightningModule``
    (``eben.py:10-50``); loss callables are optional and the set of atomic
    losses adapts accordingly, like the reference's ``compute_atomic_losses``.
    """

    sample_rate: int
    generator: EBENGenerator
    discriminator: DiscriminatorEBENMultiScales
    generator_optimizer: optax.GradientTransformation
    discriminator_optimizer: optax.GradientTransformation
    reconstructive_loss_freq_fn: Optional[Callable] = None
    reconstructive_loss_time_fn: Optional[Callable] = None
    feature_matching_loss_fn: Optional[Callable] = None
    adversarial_loss_fn: Optional[Callable] = None
    dynamic_loss_balancing: Optional[str] = None  # None | "simple" | "ema"
    beta_ema: float = 0.9
    update_discriminator_ratio: float = 1.0
    description: Optional[str] = None
    # after trainer.test: export the generator to the hub (ref eben.py:177-182)
    push_to_hub_after_testing: bool = False
    hub_repo_id: Optional[str] = None
    # gradient accumulation: wrap both optimizers in optax.MultiSteps so k
    # micro-batches accumulate before each apply (the reference's commented
    # ``accumulate_grad_batches`` trainer knob — configs/trainer/ddp.yaml:12)
    accumulate_grad_batches: int = 1
    # gradient-norm tracking (the reference's commented ``track_grad_norm``
    # trainer knob): 2 logs the global L2 grad norm per network, -1 disables
    track_grad_norm: int = -1
    # optax.flatten the injected optimizers (single fused update over one
    # concatenated vector).  Default OFF since round 3: the flat<->tiled
    # relayout copies of the 23M-param discriminator cost more than the
    # per-leaf op soup they replace (measured: batch-32 GAN step 683
    # audio-s/s per-leaf vs 640 flattened).  When enabled it is EXACT ONLY
    # FOR ELEMENTWISE TRANSFORMS (adam/sgd/adamw/clip...), and toggling
    # changes the opt-state pytree layout, so checkpoints written under one
    # setting do not restore under the other.
    flatten_optimizer: bool = False
    # mixed precision: network compute dtype for training ("bfloat16" is
    # essential on TPU, where f32 matmul paths are software-emulated — but
    # bf16 is itself emulated on CPU, so the default is None and the TPU
    # configs/bench set it explicitly); loss reductions and optimizer states
    # stay f32; eval always runs in the input dtype (f32) for metric fidelity
    compute_dtype: Optional[str] = None

    def __post_init__(self):
        assert self.dynamic_loss_balancing in {None, "simple", "ema"}
        assert 0 <= self.update_discriminator_ratio <= 1
        # configs pass optimizer factories as partials (the reference's
        # ``_partial_: true`` optimizer configs); materialize them here
        for attr in ("generator_optimizer", "discriminator_optimizer"):
            opt = getattr(self, attr)
            if not hasattr(opt, "init") and callable(opt):
                opt = opt()
            if self.accumulate_grad_batches > 1:
                opt = optax.MultiSteps(opt, every_k_schedule=self.accumulate_grad_batches)
            # flatten: run the update on ONE concatenated vector instead of
            # ~200 per-layer leaves — the per-leaf op soup cost ~13 ms/step
            # of pure dispatch/fusion overhead on this backend (profiled);
            # see the flatten_optimizer field for the exactness constraint
            if self.flatten_optimizer:
                opt = optax.flatten(opt)
            setattr(self, attr, opt)
        from vibravox_tpu.tasks.se_metrics import SEMetrics

        self._se_metrics = SEMetrics(self.sample_rate)

    def eval_metrics(self, outputs) -> Dict[str, float]:
        """Host-side SE metrics at 16 kHz (ref ``base_se.py:67-106``)."""
        return self._se_metrics(outputs)

    def on_test_end(self, state) -> None:
        """Optional hub export of the trained generator (ref ``eben.py:177-182``)."""
        if not self.push_to_hub_after_testing:
            return
        from vibravox_tpu.models.hub import push_eben_generator_to_hub

        repo = self.hub_repo_id or "Cnam-LMSSC/EBEN_export"
        push_eben_generator_to_hub(
            jax.device_get(state.gen_params), repo,
            m=self.generator.m, n=self.generator.n, p=self.generator.p,
        )

    # ------------------------------------------------------------------ #
    # state
    # ------------------------------------------------------------------ #

    @property
    def atomic_loss_names(self) -> Tuple[str, ...]:
        names = []
        if self.reconstructive_loss_freq_fn is not None:
            names.append("reconstructive_loss_freq")
        if self.reconstructive_loss_time_fn is not None:
            names.append("reconstructive_loss_temp")
        if self.feature_matching_loss_fn is not None:
            names.append("feature_matching_loss")
        if self.adversarial_loss_fn is not None:
            names.append("adv_loss_gen")
        return tuple(names)

    def init_state(self, rng: jax.Array, example_batch: Dict[str, jnp.ndarray]) -> EBENTrainState:
        k_gen, k_disc, k_state = jax.random.split(rng, 3)
        corrupted = self.generator.cut_to_valid_length(example_batch["audio_body_conducted"])
        gen_params = self.generator.init(k_gen, corrupted)
        enhanced, decomposed = self.generator.apply(gen_params, corrupted)
        disc_params = self.discriminator.init(k_disc, decomposed, enhanced)
        return EBENTrainState(
            step=jnp.zeros((), jnp.int32),
            gen_params=gen_params,
            disc_params=disc_params,
            gen_opt_state=self.generator_optimizer.init(gen_params),
            disc_opt_state=self.discriminator_optimizer.init(disc_params),
            atomic_norms_ema=jnp.zeros((len(self.atomic_loss_names),), jnp.float32),
            rng=k_state,
        )

    # ------------------------------------------------------------------ #
    # losses
    # ------------------------------------------------------------------ #

    def _generator_atomic_losses(
        self,
        disc_params: Any,
        enhanced: jnp.ndarray,
        reference: jnp.ndarray,
        decomposed_enhanced: jnp.ndarray,
        decomposed_reference: jnp.ndarray,
    ) -> Dict[str, jnp.ndarray]:
        """Generator-side atomic losses (ref ``compute_atomic_losses`` —
        ``eben.py:194-211``)."""
        losses: Dict[str, jnp.ndarray] = {}
        if self.reconstructive_loss_freq_fn is not None:
            losses["reconstructive_loss_freq"] = self.reconstructive_loss_freq_fn(
                enhanced, reference
            )
        if self.reconstructive_loss_time_fn is not None:
            losses["reconstructive_loss_temp"] = self.reconstructive_loss_time_fn(
                enhanced, reference
            )
        if self.feature_matching_loss_fn is not None or self.adversarial_loss_fn is not None:
            enhanced_emb = self.discriminator.apply(
                disc_params, decomposed_enhanced, enhanced
            )
            if self.feature_matching_loss_fn is not None:
                reference_emb = self.discriminator.apply(
                    disc_params, decomposed_reference, reference
                )
                losses["feature_matching_loss"] = self.feature_matching_loss_fn(
                    enhanced_emb, reference_emb
                )
            if self.adversarial_loss_fn is not None:
                losses["adv_loss_gen"] = self.adversarial_loss_fn(enhanced_emb, 1)
        return losses

    def _discriminator_atomic_losses(
        self,
        disc_params: Any,
        enhanced: jnp.ndarray,
        reference: jnp.ndarray,
        decomposed_enhanced: jnp.ndarray,
        decomposed_reference: jnp.ndarray,
    ) -> Dict[str, jnp.ndarray]:
        """Discriminator-side hinge losses on detached generator outputs
        (ref ``eben.py:212-219``)."""
        if self.adversarial_loss_fn is None:
            return {}
        # ONE discriminator pass over [reference ‖ enhanced] on the batch
        # axis instead of two: exact (convs are batch-parallel), halves the
        # op count, and — the real win on this backend — every dW in the
        # backward is computed once over 2B rows instead of twice over B
        # (the small-channel dW reductions are the disc-grad outliers;
        # measured: disc grad 58.4 -> 41.7 ms at batch 32).  Only while the
        # step is op-count-bound: past B=64 the 2B-row activations hit the
        # HBM-pressure cliff (the same one round 2 measured at batch 256),
        # so large batches keep two B-row passes.  The gen-side losses never
        # batch this way: there the reference branch carries a zero
        # cotangent that XLA dead-code eliminates, which batching would
        # forfeit.
        b = reference.shape[0]
        if b <= 64:
            both_emb = self.discriminator.apply(
                disc_params,
                jnp.concatenate(
                    [decomposed_reference, jax.lax.stop_gradient(decomposed_enhanced)], axis=0
                ),
                jnp.concatenate([reference, jax.lax.stop_gradient(enhanced)], axis=0),
            )
            reference_emb = jax.tree_util.tree_map(lambda x: x[:b], both_emb)
            enhanced_emb = jax.tree_util.tree_map(lambda x: x[b:], both_emb)
        else:
            enhanced_emb = self.discriminator.apply(
                disc_params,
                jax.lax.stop_gradient(decomposed_enhanced),
                jax.lax.stop_gradient(enhanced),
            )
            reference_emb = self.discriminator.apply(
                disc_params, decomposed_reference, reference
            )
        return {
            "real_loss": self.adversarial_loss_fn(reference_emb, 1),
            "fake_loss": self.adversarial_loss_fn(enhanced_emb, -1),
        }

    # ------------------------------------------------------------------ #
    # train / eval steps (jit these at the trainer level)
    # ------------------------------------------------------------------ #

    def train_step(
        self, state: EBENTrainState, batch: Dict[str, jnp.ndarray]
    ) -> Tuple[EBENTrainState, Dict[str, jnp.ndarray]]:
        """One GAN step: balanced generator update, gated discriminator update."""
        rng, k_gate = jax.random.split(state.rng)
        corrupted = self.generator.cut_to_valid_length(batch["audio_body_conducted"])
        reference = self.generator.cut_to_valid_length(batch["audio_airborne"])
        if self.compute_dtype is not None:
            dtype = jnp.dtype(self.compute_dtype)
            corrupted = corrupted.astype(dtype)
            reference = reference.astype(dtype)
        decomposed_reference = self.generator.pqmf.analysis(reference)

        logs: Dict[str, jnp.ndarray] = {}

        # ---- generator: one linearization shared by the balancing norms and
        # the main gradient.  Each atomic loss's cotangent w.r.t. the
        # generator outputs is computed once; the balancing norms reuse those
        # cotangents through a cheap tail-only vjp (last conv -> tanh ->
        # synthesis -> nothing else), and the main gradient is one full
        # generator vjp at the lambda-weighted cotangent sum.  Equivalent by
        # vjp linearity to grad(sum_i lambda_i L_i) with the reference's
        # autograd.grad(L_i, last_conv.weight) norms, but the discriminator
        # forward/backward runs once per loss instead of once per loss per
        # consumer (measured: gen-grad + balancing 113 ms -> ~70 ms). ----
        names = self.atomic_loss_names
        (enhanced, decomposed), gen_vjp = jax.vjp(
            lambda gp: self.generator.apply(gp, corrupted), state.gen_params
        )

        def losses_from_outputs(enh, dec):
            return self._generator_atomic_losses(
                state.disc_params, enh, reference, dec, decomposed_reference
            )

        gen_atomic = losses_from_outputs(enhanced, decomposed)
        import os as _os

        one = jnp.ones((), jnp.float32)
        loss_vals = []
        cotangents = []  # per loss: (d_enhanced, d_decomposed)
        disc_loss_set = {"feature_matching_loss", "adv_loss_gen"}
        vmap_disc = (
            _os.environ.get("VIBRAVOX_VMAP_DISC", "0") == "1"
            and sum(n in disc_loss_set for n in names) == 2
        )
        if vmap_disc:
            # ONE batched discriminator-input backward for the two
            # disc-dependent losses: vjp application is linear, so vmapping
            # the combined vjp over the 2x2 identity runs a single 2-row
            # backward program instead of two duplicated op sets (the same
            # trick as the batched tail transpose below)
            d_names = [n for n in names if n in disc_loss_set]

            def disc_losses(e, d):
                out = losses_from_outputs(e, d)
                return jnp.stack([out[n].astype(jnp.float32) for n in d_names])

            d_vals, d_vjp = jax.vjp(disc_losses, enhanced, decomposed)
            d_cts = jax.vmap(d_vjp)(jnp.eye(len(d_names), dtype=jnp.float32))
            d_map = {
                n: (d_cts[0][i], d_cts[1][i]) for i, n in enumerate(d_names)
            }
            for name in names:
                if name in d_map:
                    loss_vals.append(d_vals[d_names.index(name)])
                    cotangents.append(d_map[name])
                else:
                    val, vjp_n = jax.vjp(
                        lambda e, d, n=name: losses_from_outputs(e, d)[n].astype(jnp.float32),
                        enhanced,
                        decomposed,
                    )
                    loss_vals.append(val)
                    cotangents.append(vjp_n(one))
        else:
            # one vjp per loss: each backward traverses only its own loss
            # graph (jit DCEs the other losses' forwards out of the trace;
            # XLA CSE shares the surviving forwards with gen_atomic above)
            for name in names:
                val, vjp_n = jax.vjp(
                    lambda e, d, n=name: losses_from_outputs(e, d)[n].astype(jnp.float32),
                    enhanced,
                    decomposed,
                )
                loss_vals.append(val)
                cotangents.append(vjp_n(one))

        if self.dynamic_loss_balancing is not None:
            features, first_bands = self.generator.apply(
                state.gen_params, corrupted, method="front"
            )
            features = jax.lax.stop_gradient(features)
            first_bands = jax.lax.stop_gradient(first_bands)
            last_kernel = state.gen_params["params"]["last_conv"]["kernel"]

            def tail_fn(kernel):
                gp = {
                    "params": {
                        **state.gen_params["params"],
                        "last_conv": {
                            **state.gen_params["params"]["last_conv"],
                            "kernel": kernel,
                        },
                    }
                }
                return self.generator.apply(gp, features, first_bands, method="tail")

            _, tail_vjp = jax.vjp(tail_fn, last_kernel)
            import os as _os

            if _os.environ.get("VIBRAVOX_VMAP_TAIL", "1") == "1":
                # one BATCHED tail transpose instead of 4 sequential ones:
                # vjp application is linear, so vmapping over the stacked
                # cotangents runs a single 4-wide backward program
                cts_stacked = jax.tree_util.tree_map(
                    lambda *leaves: jnp.stack(leaves), *cotangents
                )
                norms = jax.vmap(
                    lambda ct: jnp.sqrt(
                        jnp.sum(jnp.square(tail_vjp(ct)[0].astype(jnp.float32)))
                    )
                )(cts_stacked)
            else:
                norms = jnp.stack([
                    jnp.sqrt(jnp.sum(jnp.square(tail_vjp(ct)[0].astype(jnp.float32))))
                    for ct in cotangents
                ])
            if self.dynamic_loss_balancing == "ema":
                norms_ema = jnp.where(
                    state.step == 0,
                    norms,
                    self.beta_ema * state.atomic_norms_ema + (1 - self.beta_ema) * norms,
                )
            else:  # "simple"
                norms_ema = norms
            lambdas = jax.lax.stop_gradient(
                jnp.clip(1.0 / (norms_ema + 1e-4), 0.0, 1e4)
            )
        else:
            lambdas = jnp.ones((len(names),))
            norms_ema = state.atomic_norms_ema

        weighted_ct = jax.tree_util.tree_map(
            lambda *leaves: sum(
                lambdas[i].astype(leaf.dtype) * leaf for i, leaf in enumerate(leaves)
            ),
            *cotangents,
        )
        (gen_grads,) = gen_vjp(weighted_ct)
        gen_total = jnp.sum(lambdas * jnp.stack(loss_vals))
        gen_updates, gen_opt_state = self.generator_optimizer.update(
            gen_grads, state.gen_opt_state, state.gen_params
        )
        gen_params = optax.apply_updates(state.gen_params, gen_updates)

        for k, v in gen_atomic.items():
            logs[f"train/generator/{k}"] = v
        logs["train/generator/backprop_loss"] = gen_total
        if self.track_grad_norm == 2:
            logs["train/generator/grad_2.0_norm_total"] = optax.global_norm(gen_grads)

        # ---- discriminator update (Bernoulli-gated) ----
        if self.adversarial_loss_fn is not None:
            def disc_loss_fn(disc_params):
                atomic = self._discriminator_atomic_losses(
                    disc_params, enhanced, reference, decomposed, decomposed_reference
                )
                return atomic["real_loss"] + atomic["fake_loss"], atomic

            (disc_total, disc_atomic), disc_grads = jax.value_and_grad(
                disc_loss_fn, has_aux=True
            )(state.disc_params)
            update_gate = (
                jax.random.uniform(k_gate, ()) < self.update_discriminator_ratio
            )
            gated_grads = jax.tree_util.tree_map(
                lambda g: jnp.where(update_gate, g, jnp.zeros_like(g)), disc_grads
            )
            disc_updates, new_disc_opt_state = self.discriminator_optimizer.update(
                gated_grads, state.disc_opt_state, state.disc_params
            )
            # freeze both params and optimizer state when the gate is closed
            disc_params = jax.tree_util.tree_map(
                lambda p, u: jnp.where(update_gate, p + u, p),
                state.disc_params,
                disc_updates,
            )
            disc_opt_state = jax.tree_util.tree_map(
                lambda new, old: jnp.where(update_gate, new, old),
                new_disc_opt_state,
                state.disc_opt_state,
            )
            for k, v in disc_atomic.items():
                logs[f"train/discriminator/{k}"] = v
            logs["train/discriminator/backprop_loss"] = disc_total
            if self.track_grad_norm == 2:
                logs["train/discriminator/grad_2.0_norm_total"] = optax.global_norm(disc_grads)
        else:
            disc_params = state.disc_params
            disc_opt_state = state.disc_opt_state

        new_state = state.replace(
            step=state.step + 1,
            gen_params=gen_params,
            disc_params=disc_params,
            gen_opt_state=gen_opt_state,
            disc_opt_state=disc_opt_state,
            atomic_norms_ema=norms_ema,
            rng=rng,
        )
        return new_state, logs

    def eval_step(
        self, state: EBENTrainState, batch: Dict[str, jnp.ndarray]
    ) -> Dict[str, jnp.ndarray]:
        """Forward + both nets' losses; returns outputs for metric computation
        (ref ``common_eval_step`` — ``eben.py:132-165``)."""
        corrupted = self.generator.cut_to_valid_length(batch["audio_body_conducted"])
        enhanced, decomposed = self.generator.apply(state.gen_params, corrupted)
        outputs: Dict[str, jnp.ndarray] = {"corrupted": corrupted, "enhanced": enhanced}
        logs: Dict[str, jnp.ndarray] = {}
        if "audio_airborne" in batch:
            reference = self.generator.cut_to_valid_length(batch["audio_airborne"])
            decomposed_reference = self.generator.pqmf.analysis(reference)
            outputs["reference"] = reference
            gen_atomic = self._generator_atomic_losses(
                state.disc_params, enhanced, reference, decomposed, decomposed_reference
            )
            disc_atomic = self._discriminator_atomic_losses(
                state.disc_params, enhanced, reference, decomposed, decomposed_reference
            )
            for k, v in gen_atomic.items():
                logs[f"generator/{k}"] = v
            for k, v in disc_atomic.items():
                logs[f"discriminator/{k}"] = v
        outputs["logs"] = logs
        return outputs
