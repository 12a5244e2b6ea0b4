"""Persistent XLA compilation cache setup.

First-time compiles of the fused GAN train step take minutes over a
remote-compile TPU tunnel; the on-disk cache brings warm starts down to
seconds.  Call once before the first jit.
"""

from __future__ import annotations

import os

__all__ = ["enable_compilation_cache", "host_cpu_fingerprint"]


def host_cpu_fingerprint() -> str:
    """Short digest of the host's CPU feature flags, for keying persistent
    XLA:CPU compile-cache directories.

    XLA:CPU AOT cache entries embed the machine features they were compiled
    with (``+amx-*``, ``+prefer-no-gather``, ...); loading an entry on a host
    WITHOUT those features "could lead to execution errors such as SIGILL"
    (cpu_aot_loader.cc warning observed in MULTICHIP_r04.json).  A build
    fingerprint alone does not prevent that cross-*host* reuse — this digest
    does: different flags ⇒ different cache dir ⇒ cold compile, never a
    mismatched load.  Falls back to the machine/arch string where
    /proc/cpuinfo is unavailable (macOS, containers without procfs)."""
    import hashlib
    import platform

    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                key = line.split(":", 1)[0].strip().lower()
                if key in ("flags", "features"):  # x86 / arm64 respectively
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    if not feats:
        feats = f"{platform.machine()}-{platform.processor()}"
    return hashlib.sha256(feats.encode()).hexdigest()[:12]


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "VIBRAVOX_TPU_CACHE", os.path.expanduser("~/.cache/vibravox_tpu_xla")
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags: compile cold
