"""Trainer: the explicit jit-compiled train/eval loop.

Replaces the Lightning ``Trainer`` + hook machinery (``run.py:39-53``) with
a small explicit loop: batches stream from the host loader, the task's pure
``train_step`` runs jitted over the device mesh (data-parallel sharding via
``DataParallel``), validation runs every N epochs, checkpoints follow the
monitor/top-k/last semantics, and ``test(ckpt_path='last')`` reloads and
evaluates like the reference's post-fit test pass.
"""

from __future__ import annotations

import time
from typing import Any, Dict, Iterable, Optional

import jax
import numpy as np

from vibravox_tpu.core.callbacks import ModelSummary
from vibravox_tpu.core.checkpoint import CheckpointManager
from vibravox_tpu.core.guard import AnomalyDetected, FailureGuard
from vibravox_tpu.core.logging import Logger, NoOpLogger
from vibravox_tpu.core.profiler import StepTimer, trace_window
from vibravox_tpu.parallel.mesh import DataParallel, MeshConfig, build_mesh

__all__ = ["Trainer"]


def _as_float_logs(logs: Dict[str, Any]) -> Dict[str, float]:
    return {k: float(v) for k, v in logs.items()}


class Trainer:
    def __init__(
        self,
        max_epochs: int = 1,
        check_val_every_n_epoch: int = 1,
        log_every_n_steps: int = 100,
        limit_train_batches: Optional[int] = None,
        limit_val_batches: Optional[int] = None,
        limit_test_batches: Optional[int] = None,
        checkpoint: Optional[CheckpointManager] = None,
        logger: Optional[Logger] = None,
        mesh: Optional[MeshConfig] = None,
        seed: int = 42,
        profile_dir: Optional[str] = None,
        num_audio_logs: int = 15,
        precision: Optional[str] = None,
        overfit_batches: int = 0,
        model_summary: Optional[ModelSummary] = None,
        failure_guard: Optional[Any] = None,
        preemption_checkpoint: bool = True,
    ):
        """``precision``/``overfit_batches`` mirror the reference trainer's
        (commented) config surface (``configs/trainer/ddp.yaml:12-22``):

        * ``precision``: "32-true"/"32" keeps f32; "bf16-mixed"/"bf16-true"/
          "bf16" (and "16-*", which map to bf16 on TPU) set the task's
          ``compute_dtype`` before compilation;
        * ``overfit_batches``: N > 0 trains on the same first N batches every
          epoch and validates on the train loader (Lightning semantics).
        """
        self.max_epochs = max_epochs
        self.check_val_every_n_epoch = check_val_every_n_epoch
        self.log_every_n_steps = log_every_n_steps
        self.limit_train_batches = limit_train_batches
        self.limit_val_batches = limit_val_batches
        self.limit_test_batches = limit_test_batches
        self.checkpoint = checkpoint
        self.logger = logger or NoOpLogger()
        self.mesh_config = mesh if isinstance(mesh, MeshConfig) else MeshConfig(**(mesh or {}))
        self.seed = seed
        self.profile_dir = profile_dir
        self.num_audio_logs = num_audio_logs
        self.precision = precision
        self.model_summary = model_summary or ModelSummary(max_depth=1)
        self.overfit_batches = int(overfit_batches)
        if self.overfit_batches:
            self.limit_train_batches = self.overfit_batches
            self.limit_val_batches = self.overfit_batches
        # failure detection (core/guard.py): True → defaults, dict → kwargs
        if failure_guard is True:
            failure_guard = FailureGuard()
        elif isinstance(failure_guard, dict):
            failure_guard = FailureGuard(**failure_guard)
        self.failure_guard: Optional[FailureGuard] = failure_guard
        # preemption-aware checkpointing: SLURM sends SIGTERM/SIGUSR1 ahead
        # of the kill (TPU maintenance events likewise); the reference loses
        # the partial epoch and relies on resubmission (SURVEY §5).  On
        # signal we finish the in-flight step, save `last`, and exit cleanly
        # so the resubmitted job resumes the interrupted epoch.
        self.preemption_checkpoint = preemption_checkpoint
        self._preempt_signum: Optional[int] = None

        self.state = None
        self.global_step = 0
        self.current_epoch = 0
        self._dp: Optional[DataParallel] = None
        self._num_val_runs = 0

    # ------------------------------------------------------------------ #

    def _apply_precision(self, task) -> None:
        if self.precision is None or not hasattr(task, "compute_dtype"):
            return
        p = str(self.precision)
        if p in ("32", "32-true"):
            dtype = None
        elif p.startswith(("bf16", "16")):  # 16-* maps to bf16 on TPU
            dtype = "bfloat16"
        else:
            raise ValueError(f"unsupported precision {self.precision!r}")
        if hasattr(task, "set_compute_dtype"):
            task.set_compute_dtype(dtype)  # tasks that rebuild their module
        else:
            task.compute_dtype = dtype

    def _ensure_dp(self, task) -> DataParallel:
        if self._dp is None:
            self._apply_precision(task)
            self._dp = DataParallel(
                task,
                build_mesh(self.mesh_config),
                fsdp=self.mesh_config.fsdp,
                fsdp_min_size=self.mesh_config.fsdp_min_size,
            )
        return self._dp

    def fit(self, task, datamodule) -> None:
        datamodule.setup("fit")
        dp = self._ensure_dp(task)
        train_loader = datamodule.train_dataloader()
        if self.overfit_batches and hasattr(train_loader, "shuffle"):
            train_loader.shuffle = False  # same first N batches every epoch

        # init (or resume) state from an example batch (inference-only tasks
        # may have an empty train loader — the reference runs those with
        # limit_train_batches=0 and goes straight to test)
        try:
            example = next(iter(train_loader))
        except StopIteration:
            return
        if self.state is None:
            self.state = dp.init_state(jax.random.key(self.seed), example)
            if self.checkpoint is not None and self.checkpoint.has_last():
                self.state = self.checkpoint.restore(self.state, "last")
                progress = self.checkpoint.trainer_state()
                self.current_epoch = int(progress.get("epoch", -1)) + 1
                self.global_step = int(progress.get("global_step", 0))

        if getattr(task, "description", None):
            self.logger.log_text("description", task.description)
        # reference's RichModelSummary callback analog
        # (configs/callbacks/rich_model_summary.yaml)
        self.model_summary(self.state, self.logger)

        timer = StepTimer()
        profiler_trace = None
        self._preempt_signum = None
        prev_handlers = (
            self._install_preemption_handlers()
            if self.preemption_checkpoint and self.checkpoint is not None
            else {}
        )
        try:
            self._fit_epochs(task, dp, datamodule, train_loader, timer, profiler_trace)
        finally:
            self._restore_signal_handlers(prev_handlers)
        self.logger.flush()

    def _fit_epochs(self, task, dp, datamodule, train_loader, timer, profiler_trace) -> None:
        epoch = self.current_epoch
        while epoch < self.max_epochs:
            self.current_epoch = epoch
            if hasattr(train_loader, "set_epoch"):
                # key the shuffle to the trainer epoch, so resumed runs see
                # epoch-N order, not a replay of pass-1 (data/loader.py)
                train_loader.set_epoch(epoch)
            epoch_t0 = time.perf_counter()
            audio_seconds = 0.0
            anomaly: Optional[str] = None
            logs: Optional[Dict[str, Any]] = None
            preempted_mid_epoch = False
            stepped = False
            for i, batch in enumerate(train_loader):
                if self.limit_train_batches is not None and i >= self.limit_train_batches:
                    break
                if self._preempt_signum is not None:
                    # don't start a new step under a preemption deadline; a
                    # signal that landed DURING the epoch's final step does
                    # not reach here — the loader exhausts first and the
                    # fully-completed epoch takes the normal val/save path
                    preempted_mid_epoch = True
                    break
                if self.profile_dir and self.global_step == 8:
                    profiler_trace = trace_window(self.profile_dir).__enter__()
                timer.start()
                self.state, logs = dp.train_step(self.state, batch)
                timer.stop()
                stepped = True
                if profiler_trace is not None and self.global_step == 10:
                    jax.block_until_ready(self.state)
                    profiler_trace.__exit__()
                    profiler_trace = None
                x = batch.get("audio_body_conducted", batch.get("audio"))
                if x is not None:
                    audio_seconds += x.shape[0] * x.shape[1] / task.sample_rate
                # guard scans piggyback on the logging cadence (the logs are
                # floated — host-synced — there anyway); scan_every_n_steps
                # adds denser scans, each costing one extra host sync
                should_log = self.global_step % self.log_every_n_steps == 0
                scan_n = (
                    self.failure_guard.scan_every_n_steps
                    if self.failure_guard is not None
                    else None
                )
                if should_log or (scan_n and self.global_step % scan_n == 0):
                    floated = _as_float_logs(logs)
                    if should_log:
                        self.logger.log_scalars(floated, self.global_step)
                    if self.failure_guard is not None:
                        anomaly = self.failure_guard.scan(floated)
                        if anomaly is not None:
                            break
                self.global_step += 1
            jax.block_until_ready(self.state)
            # end-of-epoch barrier (core/guard.py): scan the final step's
            # logs AND the state itself — the final backward/update can mint
            # non-finite grads/params while its pre-update forward loss is
            # still finite, so the state scan is what actually guarantees a
            # poisoned state never reaches checkpoint.save below
            if anomaly is None and self.failure_guard is not None and logs is not None:
                anomaly = self.failure_guard.scan(_as_float_logs(logs))
            if anomaly is None and self.failure_guard is not None and stepped:
                anomaly = self.failure_guard.scan_state(self.state)
            if anomaly is not None:
                epoch = self._recover(anomaly)
                continue
            if preempted_mid_epoch:
                # save with the previous epoch's marker so the resubmitted
                # job replays the interrupted epoch from its start (the
                # guard scan above already certified the state is clean);
                # skip the save when no step ran since the last epoch-end
                # save (same global_step — that checkpoint already exists)
                if stepped:
                    self.checkpoint.save(
                        self.state, self.global_step, {},
                        trainer_state={"epoch": epoch - 1, "global_step": self.global_step},
                    )
                self.logger.log_text(
                    "preemption",
                    f"signal {self._preempt_signum}: checkpointed at epoch "
                    f"{epoch}, step {self.global_step}; exiting for resubmission",
                )
                return
            wall = time.perf_counter() - epoch_t0
            epoch_metrics = {
                "train/epoch_wall_seconds": wall,
                "train/audio_seconds_per_second": audio_seconds / max(wall, 1e-9),
            }
            epoch_metrics.update(timer.summary("train/"))
            self.logger.log_scalars(epoch_metrics, self.global_step)

            val_metrics: Dict[str, float] = {}
            if (epoch + 1) % self.check_val_every_n_epoch == 0:
                # overfit_batches: validate on the train data (Lightning)
                val_loader = (
                    train_loader if self.overfit_batches else datamodule.val_dataloader()
                )
                val_metrics = self._evaluate(task, val_loader, "validation")
            if self.checkpoint is not None:
                self.checkpoint.save(
                    self.state, self.global_step, val_metrics,
                    trainer_state={"epoch": epoch, "global_step": self.global_step},
                )
            if self._preempt_signum is not None:
                # signal landed during the epoch's final step or validation:
                # the epoch completed and was saved as such above (monitor/
                # top-k included); exit for resubmission — the resumed job
                # starts the NEXT epoch instead of replaying this one
                self.logger.log_text(
                    "preemption",
                    f"signal {self._preempt_signum}: epoch {epoch} completed "
                    f"and checkpointed; exiting for resubmission",
                )
                return
            epoch += 1

    def _on_preempt(self, signum, frame) -> None:
        del frame
        self._preempt_signum = signum

    def _install_preemption_handlers(self) -> Dict[int, Any]:
        import signal

        prev: Dict[int, Any] = {}
        for sig in (signal.SIGTERM, signal.SIGUSR1):
            try:
                prev[sig] = signal.signal(sig, self._on_preempt)
            except (ValueError, OSError):  # non-main thread / unsupported
                pass
        return prev

    @staticmethod
    def _restore_signal_handlers(prev: Dict[int, Any]) -> None:
        import signal

        for sig, handler in prev.items():
            signal.signal(sig, handler)

    def _recover(self, reason: str) -> int:
        """Restore the ``last`` checkpoint after a detected anomaly; return
        the epoch to resume from.  Raises :class:`AnomalyDetected` when no
        restore point exists or the guard's budget is exhausted."""
        guard = self.failure_guard
        restorable = self.checkpoint is not None and self.checkpoint.has_last()
        if not restorable or guard.restores_used >= guard.max_restores:
            raise AnomalyDetected(
                f"{reason}; "
                + (
                    f"restore budget exhausted ({guard.restores_used}/{guard.max_restores})"
                    if restorable
                    else "no 'last' checkpoint to restore"
                )
            )
        guard.restores_used += 1
        self.state = self.checkpoint.restore(self.state, "last")
        progress = self.checkpoint.trainer_state()
        self.global_step = int(progress.get("global_step", 0))
        next_epoch = int(progress.get("epoch", -1)) + 1
        self.logger.log_scalars(
            {"anomaly/restores": float(guard.restores_used)}, self.global_step
        )
        self.logger.log_text(
            "anomaly/restore",
            f"{reason} -> restored 'last', resuming at epoch {next_epoch}",
        )
        return next_epoch

    # ------------------------------------------------------------------ #

    def _evaluate(self, task, loaders, stage: str) -> Dict[str, float]:
        dp = self._ensure_dp(task)
        self._num_val_runs += 1
        if not isinstance(loaders, dict):
            loaders = {"": loaders}
        limit = self.limit_val_batches if stage == "validation" else self.limit_test_batches
        all_metrics: Dict[str, float] = {}
        for dl_name, loader in loaders.items():
            suffix = f"/{dl_name}" if dl_name else ""
            sums: Dict[str, float] = {}
            count = 0
            for i, batch in enumerate(loader):
                if limit is not None and i >= limit:
                    break
                if hasattr(task, "prepare_eval_batch"):
                    batch = task.prepare_eval_batch(batch)
                outputs = dp.eval_step(self.state, batch)
                logs = outputs.pop("logs", {})
                metrics = task.eval_metrics(outputs) if hasattr(task, "eval_metrics") else {}
                for k, v in {**_as_float_logs(logs), **metrics}.items():
                    sums[k] = sums.get(k, 0.0) + v
                if hasattr(task, "on_eval_batch_end"):
                    task.on_eval_batch_end(outputs)
                count += 1
                if i < self.num_audio_logs and stage in ("validation", "test"):
                    self._log_audio(task, outputs, stage, dl_name, i)
                    if getattr(task, "last_decoded", None):
                        pred, target = task.last_decoded
                        self.logger.log_text(
                            f"{stage}_{dl_name or 'main'}_{i}/decode",
                            f"pred: {pred}\ntarget: {target}", self._num_val_runs,
                        )
            if count:
                for k, v in sums.items():
                    all_metrics[f"{stage}/{k}{suffix}"] = v / count
            if count and hasattr(task, "on_eval_epoch_end"):
                for k, v in task.on_eval_epoch_end().items():
                    all_metrics[f"{stage}/{k}{suffix}"] = float(v)
        if all_metrics:
            self.logger.log_scalars(all_metrics, self.global_step)
        return all_metrics

    def _log_audio(self, task, outputs, stage: str, dl_name: str, batch_idx: int) -> None:
        prefix = f"{stage}_{dl_name}_" if dl_name else f"{stage}_"
        for tier in ("enhanced", "corrupted", "reference"):
            if tier in outputs:
                audio = np.asarray(outputs[tier])[0]
                self.logger.log_audio(
                    f"{prefix}{batch_idx}/{tier}", audio, self._num_val_runs,
                    task.sample_rate,
                )

    # ------------------------------------------------------------------ #

    def test(self, task, datamodule, ckpt_path: Optional[str] = "last") -> Dict[str, float]:
        datamodule.setup("test")
        dp = self._ensure_dp(task)
        if self.state is None:
            example = next(iter(self._first_loader(datamodule.test_dataloader())))
            self.state = dp.init_state(jax.random.key(self.seed), example)
        if ckpt_path and self.checkpoint is not None and self.checkpoint.has_last():
            self.state = self.checkpoint.restore(self.state, ckpt_path)
        metrics = self._evaluate(task, datamodule.test_dataloader(), "test")
        if hasattr(task, "on_test_end"):
            task.on_test_end(self.state)
        self.logger.flush()
        return metrics

    @staticmethod
    def _first_loader(loaders):
        return next(iter(loaders.values())) if isinstance(loaders, dict) else loaders
