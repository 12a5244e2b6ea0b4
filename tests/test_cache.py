"""Persistent-compile-cache fingerprinting.

Round-5 hardening: XLA:CPU AOT cache entries embed host machine features
(+amx-*, +prefer-no-gather, ...); loading an entry on a host without them
risks SIGILL (cpu_aot_loader.cc warnings observed in MULTICHIP_r04.json).
The fix keys every persistent cache dir on a digest of the host CPU flags so
a different host resolves a different (empty) dir and compiles cold — a
mismatched entry can never load by construction.  These tests pin that the
digest is deterministic, flag-sensitive, and actually wired into both the
dryrun and the test-suite cache dirs.
"""

import builtins
import io

import jax

from vibravox_tpu.core.cache import host_cpu_fingerprint


def test_fingerprint_deterministic():
    a, b = host_cpu_fingerprint(), host_cpu_fingerprint()
    assert a == b
    assert len(a) == 12
    int(a, 16)  # hex digest


def test_fingerprint_changes_with_cpu_flags(monkeypatch):
    """Different /proc/cpuinfo feature flags must yield a different digest
    (same flags in a different order must NOT — the digest sorts them)."""
    real_open = builtins.open

    def fake_open(path, *args, **kwargs):
        if path == "/proc/cpuinfo":
            return io.StringIO(fake_open.content)
        return real_open(path, *args, **kwargs)

    monkeypatch.setattr(builtins, "open", fake_open)

    fake_open.content = "processor: 0\nflags\t\t: fpu sse2 avx amx_tile\n"
    with_amx = host_cpu_fingerprint()
    fake_open.content = "processor: 0\nflags\t\t: fpu sse2 avx\n"
    without_amx = host_cpu_fingerprint()
    fake_open.content = "processor: 0\nflags\t\t: avx amx_tile sse2 fpu\n"
    reordered = host_cpu_fingerprint()

    assert with_amx != without_amx
    assert reordered == with_amx


def test_dryrun_cache_dir_is_host_keyed():
    """_enable_cpu_dryrun_cache must embed the host digest in the cache dir
    (and so must the suite's own cache, configured by conftest)."""
    import __graft_entry__

    old = jax.config.jax_compilation_cache_dir
    try:
        __graft_entry__._enable_cpu_dryrun_cache()
        configured = jax.config.jax_compilation_cache_dir
        assert configured is not None
        assert host_cpu_fingerprint() in configured
        assert jax.__version__ in configured
    finally:
        jax.config.update("jax_compilation_cache_dir", old)
    if old is not None:  # the conftest-configured suite cache
        assert host_cpu_fingerprint() in old
