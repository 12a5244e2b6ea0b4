"""Failure-detection subsystem (core/guard.py): anomaly scan + auto-restore.

The reference has no failure detection (SURVEY §5 — SLURM resubmission +
save_last only); these tests pin the behavior this framework adds: a
non-finite training step is detected from the already-synced logs, the
``last`` checkpoint is restored, and training resumes — with a bounded
restore budget and a loud failure when no restore point exists.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vibravox_tpu.core.checkpoint import CheckpointManager
from vibravox_tpu.core.guard import AnomalyDetected, FailureGuard
from vibravox_tpu.core.loop import Trainer


class TestFailureGuardScan:
    def test_finite_logs_pass(self):
        assert FailureGuard().scan({"train/loss": 1.5, "train/lr": 3e-4}) is None

    def test_nan_and_inf_caught_on_any_key(self):
        g = FailureGuard()
        assert "non-finite" in g.scan({"train/loss": float("nan")})
        assert "non-finite" in g.scan({"train/grad_norm": float("inf")})

    def test_divergence_bound_applies_to_loss_keys_only(self):
        g = FailureGuard(max_loss=100.0)
        assert "divergent" in g.scan({"train/ctc_loss": 1e6})
        # non-loss keys (lambdas, grad norms) may legitimately be large
        assert g.scan({"train/lambda_adv": 1e6}) is None


# --------------------------------------------------------------------- #
# Integration: a minimal Task + re-iterable loader with scheduled NaN
# injection.  Pass indexing: Trainer.fit draws one example batch for init
# (pass 0) before the epoch loop, so epoch N iterates pass N + 1.
# --------------------------------------------------------------------- #


class _ToyTask:
    sample_rate = 16000

    def init_state(self, rng, batch):
        del rng, batch
        return {"w": jnp.zeros((4,), jnp.float32), "step": jnp.zeros((), jnp.int32)}

    def train_step(self, state, batch):
        def loss_fn(w):
            return jnp.mean((batch["x"] @ w - 1.0) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(state["w"])
        new = {"w": state["w"] - 0.1 * g, "step": state["step"] + 1}
        return new, {"train/loss": loss}

    def eval_step(self, state, batch):
        return {"logs": {"loss": jnp.mean((batch["x"] @ state["w"] - 1.0) ** 2)}}


class _PoisonLoader:
    """Yields one (B=8, D=4) batch per iteration pass (divisible by the
    8-device test mesh's data axis); batches whose pass index is in
    ``poison_passes`` carry NaN inputs."""

    def __init__(self, poison_passes):
        self.poison_passes = poison_passes
        self.pass_idx = 0
        rng = np.random.default_rng(0)
        self.x = rng.standard_normal((8, 4)).astype(np.float32)

    def __iter__(self):
        idx = self.pass_idx
        self.pass_idx += 1
        x = self.x.copy()
        if idx in self.poison_passes:
            x[0, 0] = np.nan
        yield {"x": x}


class _ToyDataModule:
    def __init__(self, poison_passes):
        self.loader = _PoisonLoader(poison_passes)

    def setup(self, stage):
        pass

    def train_dataloader(self):
        return self.loader


def _trainer(tmp_path, *, checkpoint=True, guard=True, max_epochs=3):
    mgr = CheckpointManager(str(tmp_path / "ckpt"), save_last=True) if checkpoint else None
    return Trainer(
        max_epochs=max_epochs,
        check_val_every_n_epoch=100,  # no val loader in the toy datamodule
        limit_train_batches=1,
        log_every_n_steps=1,
        checkpoint=mgr,
        failure_guard=guard,
    )


class TestTrainerAnomalyRecovery:
    def test_nan_step_restores_last_and_resumes(self, tmp_path):
        # epoch 0 clean (checkpoint saved), epoch 1 poisoned once, then clean
        dm = _ToyDataModule(poison_passes={2})
        trainer = _trainer(tmp_path)
        trainer.fit(_ToyTask(), dm)

        assert trainer.failure_guard.restores_used == 1
        assert trainer.current_epoch == 2  # all 3 epochs completed
        assert trainer.global_step == 3  # the poisoned step was not counted
        assert np.isfinite(np.asarray(trainer.state["w"])).all()
        # the recovery replayed epoch 1: 3 counted optimizer steps
        assert int(np.asarray(trainer.state["step"])) == 3

    def test_no_checkpoint_raises(self, tmp_path):
        dm = _ToyDataModule(poison_passes={1})  # poisoned on the first epoch
        trainer = _trainer(tmp_path, checkpoint=False)
        with pytest.raises(AnomalyDetected, match="no 'last' checkpoint"):
            trainer.fit(_ToyTask(), dm)

    def test_restore_budget_bounds_deterministic_faults(self, tmp_path):
        # epoch 0 clean, every later pass poisoned: restore once, the fault
        # reproduces, the exhausted budget fails loudly (no livelock)
        dm = _ToyDataModule(poison_passes=set(range(2, 50)))
        trainer = _trainer(tmp_path)
        trainer.failure_guard.max_restores = 1
        with pytest.raises(AnomalyDetected, match="budget exhausted"):
            trainer.fit(_ToyTask(), dm)
        assert trainer.failure_guard.restores_used == 1

    def test_sigterm_checkpoints_and_resumes(self, tmp_path):
        """Preemption-aware checkpointing: SIGTERM mid-epoch finishes the
        in-flight step, saves `last`, exits fit; a resubmitted run resumes
        the interrupted epoch (the reference loses the partial epoch and
        relies on bare SLURM resubmission — SURVEY §5)."""
        import os
        import signal

        class _SignalingLoader(_PoisonLoader):
            def __iter__(self):
                idx = self.pass_idx
                self.pass_idx += 1
                for j in range(3):
                    if idx == 1 and j == 2:  # mid-epoch-0, after 2 steps
                        os.kill(os.getpid(), signal.SIGTERM)
                    yield {"x": self.x.copy()}

        dm = _ToyDataModule(poison_passes=set())
        dm.loader = _SignalingLoader(set())
        trainer = _trainer(tmp_path, max_epochs=2)
        trainer.limit_train_batches = None
        trainer.fit(_ToyTask(), dm)
        # the signal landed after step 2 of epoch 0; fit saved and returned
        assert trainer._preempt_signum == signal.SIGTERM
        assert trainer.global_step == 2
        assert trainer.checkpoint.has_last()

        # resubmission: a fresh Trainer replays epoch 0 from its start
        trainer2 = _trainer(tmp_path, max_epochs=2)
        trainer2.limit_train_batches = None
        trainer2.fit(_ToyTask(), dm)
        assert trainer2.current_epoch == 1
        assert trainer2.global_step == 2 + 3 + 3
        assert np.isfinite(np.asarray(trainer2.state["w"])).all()

    def test_elastic_restore_across_mesh_sizes(self, tmp_path):
        """Elastic resubmission: a checkpoint written under the 8-device DP
        mesh restores onto a 4-device mesh (different slice size after
        preemption) and training continues — orbax reshards on restore."""
        from vibravox_tpu.parallel.mesh import DataParallel, MeshConfig, build_mesh

        dm = _ToyDataModule(poison_passes=set())
        t1 = _trainer(tmp_path, max_epochs=1)  # default mesh: all 8 devices
        t1.fit(_ToyTask(), dm)
        w8 = np.asarray(t1.state["w"])

        mesh4 = build_mesh(MeshConfig(data=4, model=1), jax.devices()[:4])
        dp4 = DataParallel(_ToyTask(), mesh4, donate_state=False)
        batch = next(iter(dm.loader))
        state4 = dp4.init_state(jax.random.key(0), batch)
        mgr = CheckpointManager(str(tmp_path / "ckpt"), save_last=True)
        restored = mgr.restore(state4, "last")
        np.testing.assert_allclose(np.asarray(restored["w"]), w8)

        stepped, logs = dp4.train_step(restored, batch)
        assert np.isfinite(float(logs["train/loss"]))
        assert int(np.asarray(stepped["step"])) == int(np.asarray(t1.state["step"])) + 1

    def test_sigterm_during_final_step_completes_epoch(self, tmp_path):
        """A signal landing during the epoch's LAST step must not mark the
        fully-completed epoch as interrupted: the normal epoch-end save runs
        (trainer_state epoch = N, not N-1) and the resumed job starts the
        NEXT epoch instead of replaying applied updates (ADVICE r3)."""
        import os
        import signal

        class _FinalStepSignalLoader(_PoisonLoader):
            def __iter__(self):
                idx = self.pass_idx
                self.pass_idx += 1
                for j in range(3):
                    yield {"x": self.x.copy()}
                    # post-yield code runs when the consumer asks for the
                    # NEXT item, i.e. after the final batch's step ran —
                    # the signal lands "during the final step"
                    if idx == 1 and j == 2:
                        os.kill(os.getpid(), signal.SIGTERM)

        dm = _ToyDataModule(poison_passes=set())
        dm.loader = _FinalStepSignalLoader(set())
        trainer = _trainer(tmp_path, max_epochs=3)
        trainer.limit_train_batches = None
        trainer.fit(_ToyTask(), dm)
        assert trainer._preempt_signum == signal.SIGTERM
        assert trainer.global_step == 3  # all 3 steps of epoch 0 ran
        # the checkpoint records a COMPLETED epoch 0
        assert trainer.checkpoint.trainer_state()["epoch"] == 0

        # resubmission starts at epoch 1 — no replay of epoch 0
        trainer2 = _trainer(tmp_path, max_epochs=2)
        trainer2.limit_train_batches = None
        trainer2.fit(_ToyTask(), dm)
        assert trainer2.global_step == 3 + 3
        assert int(np.asarray(trainer2.state["step"])) == 6

    def test_scan_every_n_steps_beats_sparse_logging(self, tmp_path):
        """With log_every_n_steps=100 a NaN at step 1 would train on garbage
        until the next logged step; scan_every_n_steps=1 catches it at the
        step (one extra host sync per scan — core/guard.py)."""

        class _MultiBatchPoisonLoader(_PoisonLoader):
            def __iter__(self):
                idx = self.pass_idx
                self.pass_idx += 1
                for j in range(3):
                    x = self.x.copy()
                    if idx == 2 and j == 1:  # step 1 of epoch 1
                        x[0, 0] = np.nan
                    yield {"x": x}

        dm = _ToyDataModule(poison_passes=set())
        dm.loader = _MultiBatchPoisonLoader(set())
        trainer = _trainer(tmp_path, max_epochs=3)
        trainer.limit_train_batches = None
        trainer.log_every_n_steps = 100
        trainer.failure_guard.scan_every_n_steps = 1
        trainer.fit(_ToyTask(), dm)
        assert trainer.failure_guard.restores_used == 1
        # the poisoned step was detected immediately and not counted;
        # recovery replayed epoch 1 → 9 counted optimizer steps
        assert int(np.asarray(trainer.state["step"])) == 9
        assert np.isfinite(np.asarray(trainer.state["w"])).all()

    def test_epoch_end_state_scan_catches_finite_loss_nan_update(self, tmp_path):
        """The epoch's FINAL step can report a finite (pre-update) loss while
        its backward/update mints non-finite params; the epoch-end barrier
        must verify the STATE, not the logged losses, before `last` is
        overwritten (ADVICE r3 — guard.scan_state)."""

        class _NaNUpdateTask(_ToyTask):
            def train_step(self, state, batch):
                # forward loss from the CLEAN part of the batch (finite);
                # the update ingests the full batch (possibly NaN)
                loss = jnp.mean((batch["x"][1:] @ state["w"] - 1.0) ** 2)
                g = jnp.mean(batch["x"], axis=0)
                new = {"w": state["w"] - 0.1 * g, "step": state["step"] + 1}
                return new, {"train/loss": loss}

        dm = _ToyDataModule(poison_passes={2})  # epoch 1's batch poisons w
        trainer = _trainer(tmp_path)
        trainer.fit(_NaNUpdateTask(), dm)
        # the logged loss stayed finite; only the state scan could detect it
        assert trainer.failure_guard.restores_used == 1
        assert np.isfinite(np.asarray(trainer.state["w"])).all()

    def test_scan_state_names_offending_leaf(self):
        g = FailureGuard()
        clean = {"w": jnp.ones((3,)), "step": jnp.zeros((), jnp.int32)}
        assert g.scan_state(clean) is None
        poisoned = {"w": jnp.array([1.0, np.nan, 0.0]), "step": jnp.zeros((), jnp.int32)}
        reason = g.scan_state(poisoned)
        assert reason is not None and "w" in reason

    def test_guard_off_by_default(self, tmp_path):
        # without a guard the poisoned step trains through (documents the
        # default-off behavior: zero change to existing recipes)
        dm = _ToyDataModule(poison_passes={2})
        trainer = _trainer(tmp_path, guard=None)
        trainer.fit(_ToyTask(), dm)
        assert trainer.failure_guard is None
        assert not np.isfinite(np.asarray(trainer.state["w"])).all()
