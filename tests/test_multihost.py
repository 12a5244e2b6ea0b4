"""Multi-host (multi-process) scaffolding tests.

The heavy path — two OS processes joining a `jax.distributed` coordination
service, building one global mesh, and completing a sharded EBEN GAN step —
runs through ``scripts/multihost_dryrun.py`` in subprocesses (the current
process already holds an initialized single-process backend, so the
distributed runtime must live elsewhere).

Reference equivalence: Lightning DDP multi-node via SLURM
(``/root/reference/configs/trainer/ddp.yaml:4-8``, ``slurm/*.sh``).
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


class TestDistributedInit:
    def test_noop_without_topology(self, monkeypatch):
        from vibravox_tpu.parallel import distributed

        for var in ("JAX_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES",
                    "MEGASCALE_COORDINATOR_ADDRESS"):
            monkeypatch.delenv(var, raising=False)
        assert distributed.initialize_distributed() is False
        assert distributed.process_count() == 1
        assert distributed.process_index() == 0


@pytest.mark.slow
class TestMultihostDryrun:
    def test_two_process_sharded_step(self):
        env = dict(os.environ)
        env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
        # the workers force their own platform config; scrub this process's
        env.pop("XLA_FLAGS", None)
        proc = subprocess.run(
            [sys.executable, str(REPO / "scripts" / "multihost_dryrun.py"),
             "--nproc", "2", "--devices-per-proc", "2"],
            # two workers cold-compile the GAN step concurrently on a 1-core
            # host (~8 min alone, far more under suite contention)
            capture_output=True, text=True, timeout=2400, env=env,
            cwd=str(REPO),
        )
        assert proc.returncode == 0, proc.stdout + proc.stderr
        assert proc.stdout.count("MULTIHOST_OK") == 2, proc.stdout
