"""Failure detection: anomaly guard with checkpoint auto-restore.

The reference has NO failure detection — long jobs rely on SLURM walltime
resubmission plus ``save_last`` checkpoints (SURVEY §5; reference
``scripts/run_bwe_slurm_array_JZ.sh`` 99 h walltime, restart by hand).  On a
GAN recipe a single non-finite step silently poisons the parameters, every
subsequent step, and — worst — the next ``save_last`` checkpoint, destroying
the only restore point.  This subsystem closes that hole:

* ``FailureGuard.scan`` inspects the (already host-synced) per-step training
  logs for non-finite values, and optionally for divergence past an absolute
  loss bound.  Scans piggyback on the values the Trainer floats anyway at
  the logging cadence plus once per epoch end, so steady-state overhead is
  zero extra device syncs.  A NaN/Inf in the parameters propagates to every
  later loss value, so the end-of-epoch scan is a sound barrier: a poisoned
  state can never reach ``CheckpointManager.save``.
* On detection the Trainer restores the ``last`` checkpoint (parameters,
  optimizer state, epoch/step progress) and resumes, at most
  ``max_restores`` times; with no checkpoint or an exhausted budget it
  raises :class:`AnomalyDetected` instead of training on garbage.

Enable from config (``configs/trainer/ddp.yaml``)::

    failure_guard:            # or `failure_guard: true` for defaults
      max_restores: 2
      max_loss: 1e4

Multi-process: the scanned training logs are globally-reduced scalars
(identical on every host), so detection and the restore decision are
consistent across processes without extra communication.  Preemption
signals must reach every process (SLURM signals the whole step; TPU
maintenance events land on every host of the slice) — the orbax save the
handler triggers is a collective.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, Optional

__all__ = ["AnomalyDetected", "FailureGuard"]


class AnomalyDetected(RuntimeError):
    """A non-finite/divergent training step that could not be recovered."""


@dataclass
class FailureGuard:
    """Policy + budget for training-anomaly recovery.

    ``max_restores`` bounds restore attempts for the whole run: a
    deterministic fault (e.g. corrupt input that reproduces after restore)
    fails loudly instead of livelocking.  ``max_loss`` (optional) flags
    divergence: any logged value whose key contains ``"loss"`` with
    ``|value| > max_loss``.  Non-finite values are flagged on every key.
    """

    max_restores: int = 2
    max_loss: Optional[float] = None
    restores_used: int = field(default=0, init=False)

    def scan(self, logs: Dict[str, float]) -> Optional[str]:
        """Return a human-readable reason if ``logs`` contain an anomaly."""
        for key, value in logs.items():
            if not math.isfinite(value):
                return f"non-finite training log {key}={value}"
            if (
                self.max_loss is not None
                and "loss" in key
                and abs(value) > self.max_loss
            ):
                return f"divergent training log {key}={value} (max_loss={self.max_loss})"
        return None
