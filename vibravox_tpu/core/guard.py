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
  the logging cadence, so steady-state overhead is zero extra device syncs.
  With a sparse logging cadence a NaN at step N+1 would train on garbage
  until the next logged step — ``scan_every_n_steps`` adds denser scans at
  the cost of one host sync (device round-trip) per scan.
* ``FailureGuard.scan_state`` is the end-of-epoch barrier: a jitted
  isfinite-all reduction over every floating leaf of the train state
  (params AND optimizer state), one scalar readback per epoch.  Scanning
  the logged *losses* alone is NOT sound there — the epoch's final step's
  backward can mint non-finite grads/params while its (pre-update) forward
  loss is finite — so the Trainer verifies the state directly before any
  ``CheckpointManager.save`` can overwrite ``last``.
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
    ``scan_every_n_steps`` (optional) scans the step logs every N steps in
    addition to the logging cadence — each extra scan costs one host sync
    (the logs must be floated), trading step-pipeline overlap for detection
    latency; at the default ``None`` detection waits for the next logged
    step (up to ``log_every_n_steps - 1`` garbage steps, bounded-loss risk
    only, since the epoch-end ``scan_state`` barrier still protects the
    checkpoint).
    """

    max_restores: int = 2
    max_loss: Optional[float] = None
    scan_every_n_steps: Optional[int] = None
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

    def scan_state(self, state) -> Optional[str]:
        """Return a reason if any floating leaf of ``state`` is non-finite.

        One jitted all-reduce over the state pytree + one scalar readback;
        call at epoch end, immediately before ``CheckpointManager.save``.
        """
        if bool(_all_finite(state)):
            return None
        # cheap second pass on host to name the offending leaf
        import jax
        import numpy as np

        for path, leaf in jax.tree_util.tree_leaves_with_path(state):
            if hasattr(leaf, "dtype") and np.issubdtype(leaf.dtype, np.floating):
                if not bool(np.all(np.isfinite(np.asarray(leaf)))):
                    return f"non-finite state leaf {jax.tree_util.keystr(path)}"
        return "non-finite value in train state"


_ALL_FINITE_JIT = None  # cached jitted reduction (retraces per pytree structure)


def _all_finite(state):
    global _ALL_FINITE_JIT
    import jax
    import jax.numpy as jnp

    if _ALL_FINITE_JIT is None:

        def check(st):
            leaves = [
                leaf
                for leaf in jax.tree_util.tree_leaves(st)
                if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating)
            ]
            if not leaves:
                return jnp.asarray(True)
            return jnp.stack([jnp.all(jnp.isfinite(x)) for x in leaves]).all()

        _ALL_FINITE_JIT = jax.jit(check)
    return _ALL_FINITE_JIT(state)
