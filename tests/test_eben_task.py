"""EBEN GAN task tests: jitted train/eval step semantics.

Covers what the reference never tests (SURVEY §4 gap): training-step
mechanics — loss finiteness, parameter updates, dynamic loss balancing EMA
state, and the discriminator update gate.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from vibravox_tpu.losses.gan import FeatureMatchingLoss, HingeLoss
from vibravox_tpu.models.eben_discriminator import DiscriminatorEBENMultiScales
from vibravox_tpu.models.eben_generator import EBENGenerator
from vibravox_tpu.ops.stft import MultiResolutionSTFTLoss
from vibravox_tpu.tasks.eben import EBENTask
from vibravox_tpu.tasks.eben_oracle import balancing_lambdas_naive


def make_task(**kwargs):
    # small discriminator + short audio keep CPU compile times testable
    defaults = dict(
        sample_rate=16000,
        generator=EBENGenerator(m=4, n=32, p=2),
        discriminator=DiscriminatorEBENMultiScales(q=4, min_channels=8),
        generator_optimizer=optax.adam(3e-4, b1=0.5, b2=0.9),
        discriminator_optimizer=optax.adam(3e-4, b1=0.5, b2=0.9),
        reconstructive_loss_freq_fn=MultiResolutionSTFTLoss(
            (512,), (50,), (240,), sample_rate=16000, perceptual_weighting=True
        ),
        feature_matching_loss_fn=FeatureMatchingLoss(),
        adversarial_loss_fn=HingeLoss(),
        dynamic_loss_balancing="ema",
    )
    defaults.update(kwargs)
    return EBENTask(**defaults)


@pytest.fixture(scope="module")
def batch():
    # dedicated rng: the session rng's state depends on test ordering, and
    # the fused-vs-naive equivalence tolerances are calibrated to fixed data
    rng_np = np.random.default_rng(7)
    t = 4064  # valid length for multiple=256, n=32 (long enough for the dilation-3 disc)
    ref = rng_np.standard_normal((2, t, 1)).astype(np.float32) * 0.1
    return {
        "audio_body_conducted": jnp.asarray(ref * 0.5),
        "audio_airborne": jnp.asarray(ref),
    }


@pytest.fixture(scope="module")
def task_and_state(batch):
    task = make_task()
    state = task.init_state(jax.random.key(0), batch)
    return task, state


class TestEBENTrainStep:
    def test_losses_finite_and_logged(self, task_and_state, batch):
        task, state = task_and_state
        new_state, logs = jax.jit(task.train_step)(state, batch)
        expected = {
            "train/generator/reconstructive_loss_freq",
            "train/generator/feature_matching_loss",
            "train/generator/adv_loss_gen",
            "train/generator/backprop_loss",
            "train/discriminator/real_loss",
            "train/discriminator/fake_loss",
            "train/discriminator/backprop_loss",
        }
        assert expected <= set(logs)
        for k, v in logs.items():
            assert bool(jnp.isfinite(v)), k

    def test_params_update(self, task_and_state, batch):
        task, state = task_and_state
        new_state, _ = jax.jit(task.train_step)(state, batch)
        g0 = state.gen_params["params"]["last_conv"]["kernel"]
        g1 = new_state.gen_params["params"]["last_conv"]["kernel"]
        assert not np.allclose(np.asarray(g0), np.asarray(g1))
        assert int(new_state.step) == int(state.step) + 1

    def test_ema_norms_populated(self, task_and_state, batch):
        task, state = task_and_state
        new_state, _ = jax.jit(task.train_step)(state, batch)
        norms = np.asarray(new_state.atomic_norms_ema)
        assert norms.shape == (3,)
        assert (norms > 0).all()

    def test_disc_gate_closed_freezes_discriminator(self, batch):
        task = make_task(update_discriminator_ratio=0.0)
        state = task.init_state(jax.random.key(1), batch)
        new_state, _ = jax.jit(task.train_step)(state, batch)
        d0 = jax.tree_util.tree_leaves(state.disc_params)
        d1 = jax.tree_util.tree_leaves(new_state.disc_params)
        for a, b in zip(d0, d1):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_generator_loss_decreases(self, batch):
        # pure reconstruction (no GAN terms): loss must go down over steps
        task = make_task(
            feature_matching_loss_fn=None,
            adversarial_loss_fn=None,
            dynamic_loss_balancing=None,
            generator_optimizer=optax.adam(1e-3, b1=0.5, b2=0.9),
        )
        state = task.init_state(jax.random.key(2), batch)
        step = jax.jit(task.train_step)
        first = None
        for _ in range(8):
            state, logs = step(state, batch)
            loss = float(logs["train/generator/backprop_loss"])
            if first is None:
                first = loss
        assert loss < first, (first, loss)


class TestEBENEvalStep:
    def test_eval_outputs(self, task_and_state, batch):
        task, state = task_and_state
        out = jax.jit(task.eval_step)(state, batch)
        assert {"corrupted", "enhanced", "reference", "logs"} <= set(out)
        assert out["enhanced"].shape == out["reference"].shape
        assert "generator/adv_loss_gen" in out["logs"]
        assert "discriminator/real_loss" in out["logs"]

    def test_eval_without_reference(self, task_and_state, batch):
        task, state = task_and_state
        out = jax.jit(task.eval_step)(
            state, {"audio_body_conducted": batch["audio_body_conducted"]}
        )
        assert "reference" not in out
        assert out["logs"] == {}

    def test_gradient_accumulation(self, batch):
        task = make_task(
            feature_matching_loss_fn=None, adversarial_loss_fn=None,
            dynamic_loss_balancing=None, accumulate_grad_batches=2,
        )
        state = task.init_state(jax.random.key(3), batch)
        step = jax.jit(task.train_step)
        g0 = np.asarray(state.gen_params["params"]["last_conv"]["kernel"])
        state, _ = step(state, batch)
        g1 = np.asarray(state.gen_params["params"]["last_conv"]["kernel"])
        np.testing.assert_array_equal(g0, g1)  # first micro-batch: accumulate only
        state, _ = step(state, batch)
        g2 = np.asarray(state.gen_params["params"]["last_conv"]["kernel"])
        assert not np.allclose(g0, g2)  # second micro-batch applies the update


class TestFusedGeneratorStepEquivalence:
    """train_step's shared-linearization generator update (one full-gen vjp
    at the lambda-weighted cotangent sum + tail-vjp balancing norms) must
    equal the naive formulation: lambdas from balancing_lambdas_naive, then
    value_and_grad of sum(lambda_i * L_i)."""

    def test_grads_and_norms_match_naive(self, batch):
        task = make_task(dynamic_loss_balancing="simple",
                         generator_optimizer=optax.sgd(1.0),
                         discriminator_optimizer=optax.sgd(0.0))
        state = task.init_state(jax.random.key(0), batch)

        corrupted = task.generator.cut_to_valid_length(batch["audio_body_conducted"])
        reference = task.generator.cut_to_valid_length(batch["audio_airborne"])
        dec_ref = task.generator.pqmf.analysis(reference)

        # naive: lambdas via the tail jacobian, grads via value_and_grad
        features, first_bands = task.generator.apply(state.gen_params, corrupted, method="front")
        lambdas, norms = balancing_lambdas_naive(task, state, features, first_bands, reference, dec_ref)

        def naive_loss(gp):
            enh, dec = task.generator.apply(gp, corrupted)
            atomic = task._generator_atomic_losses(state.disc_params, enh, reference, dec, dec_ref)
            return jnp.sum(lambdas * jnp.stack([atomic[k] for k in task.atomic_loss_names]))

        naive_grads = jax.grad(naive_loss)(state.gen_params)

        # fused path: one SGD(1.0) train_step => param delta == -grads
        new_state, logs = jax.jit(task.train_step)(state, batch)
        fused_grads = jax.tree_util.tree_map(
            lambda old, new: old - new, state.gen_params, new_state.gen_params
        )
        flat_naive = jax.tree_util.tree_leaves(naive_grads)
        flat_fused = jax.tree_util.tree_leaves(fused_grads)
        for a, b in zip(flat_naive, flat_fused):
            # f32 associativity noise between the two formulations scales
            # with the leaf's gradient magnitude
            tol = max(1e-6, 2e-4 * float(np.max(np.abs(np.asarray(a)))))
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-3, atol=tol)
        np.testing.assert_allclose(
            np.asarray(new_state.atomic_norms_ema), np.asarray(norms), rtol=1e-5
        )

    def test_vmapped_disc_backward_matches_per_loss(self, batch, monkeypatch):
        """VIBRAVOX_VMAP_DISC=1 (one batched disc-input backward for the fm +
        adv losses) must produce the same updated params as the per-loss
        formulation."""
        import os

        task = make_task(dynamic_loss_balancing="ema",
                         generator_optimizer=optax.sgd(1e-2),
                         discriminator_optimizer=optax.sgd(1e-2))
        state = task.init_state(jax.random.key(0), batch)

        monkeypatch.setenv("VIBRAVOX_VMAP_DISC", "0")
        s_ref, logs_ref = jax.jit(task.train_step)(state, batch)
        monkeypatch.setenv("VIBRAVOX_VMAP_DISC", "1")
        s_vm, logs_vm = jax.jit(task.train_step)(state, batch)

        for a, b in zip(jax.tree_util.tree_leaves(s_ref.gen_params),
                        jax.tree_util.tree_leaves(s_vm.gen_params)):
            tol = max(1e-7, 1e-4 * float(np.max(np.abs(np.asarray(a)))))
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=tol)
        for k in logs_ref:
            np.testing.assert_allclose(
                float(logs_vm[k]), float(logs_ref[k]), rtol=1e-4, atol=1e-6
            )


class TestTrainerKnobs:
    def test_track_grad_norm_logs(self, batch):
        task = make_task(track_grad_norm=2)
        state = task.init_state(jax.random.key(0), batch)
        _, logs = jax.jit(task.train_step)(state, batch)
        assert "train/generator/grad_2.0_norm_total" in logs
        assert "train/discriminator/grad_2.0_norm_total" in logs
        assert float(logs["train/generator/grad_2.0_norm_total"]) > 0

    def test_trainer_precision_sets_compute_dtype(self):
        from vibravox_tpu.core.loop import Trainer

        task = make_task()
        tr = Trainer(precision="bf16-mixed")
        tr._apply_precision(task)
        assert task.compute_dtype == "bfloat16"
        tr32 = Trainer(precision="32-true")
        tr32._apply_precision(task)
        assert task.compute_dtype is None

    def test_overfit_batches_limits(self):
        from vibravox_tpu.core.loop import Trainer

        tr = Trainer(overfit_batches=3)
        assert tr.limit_train_batches == 3
        assert tr.limit_val_batches == 3
