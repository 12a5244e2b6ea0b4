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

# Persistent compilation cache for the CPU test mesh: the multi-device
# equivalence / 2-D-mesh tests compile multi-minute XLA programs on a small
# host — caching them makes suite RE-runs fast (first run populates).  Same
# mechanism run.py/bench.py use for the TPU tunnel (core/cache.py), separate
# dir so test programs never collide with hardware entries.
_test_cache = os.environ.get(
    "VIBRAVOX_TEST_CACHE", os.path.expanduser("~/.cache/vibravox_tpu_xla_cpu_tests")
)
try:
    os.makedirs(_test_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _test_cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except Exception:
    pass  # older jax / read-only home: compile cold

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
