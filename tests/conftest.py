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

# Persistent XLA:CPU compile cache for the suite, keyed by the jax/jaxlib
# build AND the host CPU feature flags (same recipe as
# __graft_entry__._enable_cpu_dryrun_cache).  The suite's cost is dominated
# by repeated cold compiles of the big train-step programs (~60 min cold on
# this 1-core host); identical programs across runs make warm suites far
# cheaper.  Round-3 history: an UNKEYED cache hit a stale-AOT
# machine-feature crash on a toolchain bump (commit bd99324); the build
# fingerprint prevents replaying entries across builds, and the host-feature
# digest prevents the cross-HOST variant (AOT entries embed +amx-*-class
# features; loading on a host without them risks SIGILL — warnings observed
# in MULTICHIP_r04.json).  The 2-process gloo workers spawn fresh
# interpreters that never see this config, so they always compile cold.
# VIBRAVOX_TEST_CACHE=0 disables.
if os.environ.get("VIBRAVOX_TEST_CACHE", "1") == "1":
    try:
        from vibravox_tpu.core.cache import host_cpu_fingerprint

        _fp = jax.__version__
        try:
            import jaxlib

            _fp = f"{jax.__version__}-{jaxlib.__version__}"
        except Exception:
            pass
        _fp = f"{_fp}-{host_cpu_fingerprint()}"
        _dir = os.path.expanduser(f"~/.cache/vibravox_tpu_xla_tests-{_fp}")
        os.makedirs(_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # cache is an accelerator, never a requirement: compile cold

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
