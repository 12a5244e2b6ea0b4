"""Persistent XLA compilation cache setup.

First-time compiles of the fused GAN train step take minutes over a
remote-compile TPU tunnel; the on-disk cache brings warm starts down to
seconds.  Call once before the first jit.
"""

from __future__ import annotations

import os

__all__ = ["enable_compilation_cache"]


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
