"""Test configuration: run everything on a virtual 8-device CPU mesh.

The TPU-native analog of the reference's fake-backend strategy
(``/root/reference/tests/conftest.py`` uses a miniature hub dataset): tests
force the CPU platform with 8 virtual XLA devices so sharding/collective
code paths run without TPU hardware.  Must run before the first jax import.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
# XLA:CPU in-process collectives SIGABRT the process if any participant takes
# longer than 40 s (default) to reach a rendezvous.  8 emulated devices on a
# small host legitimately exceed that on big train steps (observed on a
# 1-core machine: the multi-device equivalence tests abort).  The deadline is
# a hang detector, not a correctness knob — raise it.
if "collective" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += (
        " --xla_cpu_collective_timeout_seconds=1200"
        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
        " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
    )
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# NOTE: do NOT enable jax's persistent compilation cache for the CPU suite.
# Measured on this jax/XLA build: CPU AOT cache entries record pseudo machine
# features (+prefer-no-scatter/+prefer-no-gather) that the load-time host
# probe doesn't report, so warm LOADS fail ("Machine type used for XLA:CPU
# compilation doesn't match...") and crash multi-process workers.  The cache
# stays TPU-only (core/cache.py).

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng_np():
    return np.random.default_rng(42)


@pytest.fixture()
def rng_key():
    return jax.random.key(0)


@pytest.fixture(scope="session")
def sample_batch(rng_np):
    """Random waveform batch, NWC (4, 1, 15679)-equivalent of the reference's
    ``torch.randn(4, 1, 15679)`` fixture (``tests/conftest.py:39-44``)."""
    import jax.numpy as jnp

    return jnp.asarray(rng_np.standard_normal((4, 15679, 1)).astype(np.float32))


def reference_available() -> bool:
    return os.path.isdir("/root/reference/vibravox")


requires_reference = pytest.mark.skipif(
    not reference_available(), reason="PyTorch reference repo not mounted"
)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-process / long-running integration tests"
    )
