"""Multi-host (multi-process) initialization and helpers.

The reference scales with Lightning DDP over NCCL/MPI ranks
(``configs/trainer/ddp.yaml:4-8``, SLURM launchers); the TPU-native
equivalent (SURVEY §2.5) is `jax.distributed.initialize` + a global mesh
whose data axis spans hosts: every process runs the same jitted step, the
runtime carries gradient all-reduces over ICI within a slice and DCN across
slices, and each host's loader feeds only its own shard
(``data/loader.py`` per-host sharding).

Call :func:`initialize_distributed` once, before any other jax API touches
the backend.  On a TPU pod slice all coordinates are auto-detected from the
TPU metadata; elsewhere (or for the CPU dry-run harness —
``scripts/multihost_dryrun.py``) pass coordinator/process explicitly or via
the standard env vars (JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES,
JAX_PROCESS_ID).
"""

from __future__ import annotations

import os
from typing import Optional

__all__ = [
    "initialize_distributed",
    "is_initialized",
    "process_count",
    "process_index",
]

_initialized = False


def is_initialized() -> bool:
    return _initialized


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    cpu_collectives: Optional[str] = None,
) -> bool:
    """Initialize `jax.distributed` for multi-host runs; returns True if a
    multi-process runtime was set up (False for single-process runs).

    Safe to call unconditionally: a no-op when neither arguments, env vars,
    nor TPU pod metadata announce a multi-process topology.  Must run before
    the first jax backend initialization.
    """
    global _initialized
    if _initialized:
        return True

    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])

    explicit = coordinator_address is not None
    # TPU pods self-describe: jax.distributed.initialize() with no arguments
    # resolves coordinator/count/id from the TPU metadata service
    on_tpu_pod = bool(os.environ.get("TPU_WORKER_HOSTNAMES")) or bool(
        os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
    )
    if not explicit and not on_tpu_pod:
        return False

    import jax

    if cpu_collectives is None:
        cpu_collectives = os.environ.get("VIBRAVOX_CPU_COLLECTIVES", "gloo")
    try:
        jax.config.update("jax_cpu_collectives_implementation", cpu_collectives)
    except Exception:
        pass  # flag unavailable on this jax version; TPU runs don't need it

    if explicit:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    else:
        # pod auto-detect: tolerate half-announced topologies (tunneled
        # single-chip backends export garbage TPU_* vars); a real pod
        # resolves its coordinator from metadata, anything else stays
        # single-process
        try:
            jax.distributed.initialize()
        except (ValueError, RuntimeError) as e:
            import warnings

            warnings.warn(f"multi-host auto-detect failed ({e}); single-process run")
            return False
    _initialized = True
    return True


def process_count() -> int:
    import jax

    return jax.process_count()


def process_index() -> int:
    import jax

    return jax.process_index()
