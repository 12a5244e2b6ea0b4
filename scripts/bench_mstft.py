"""Focused benchmark: multi-res STFT loss forward/gradient, Pallas vs XLA.

Chained-dependency timing (see ablate_step.py for methodology).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_mstft.py
"""

from __future__ import annotations

import time


def main() -> None:
    from vibravox_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vibravox_tpu.ops.stft import MultiResolutionSTFTLoss

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    B, T = 32, 40560
    x = jnp.asarray(rng.standard_normal((B, T)).astype(np.float32) * 0.1)
    y = jnp.asarray(rng.standard_normal((B, T)).astype(np.float32) * 0.1)

    def timeit(name, f, x0, n=20):
        f = jax.jit(f)
        z = f(x0)
        jax.block_until_ready(z)
        z = x0
        t0 = time.perf_counter()
        for _ in range(n):
            z = f(z)
        jax.block_until_ready(z)
        dt = (time.perf_counter() - t0) / n
        print(f"{name:40s} {dt * 1e3:8.2f} ms", flush=True)
        return dt

    for pallas in (False, True):
        tag = "pallas" if pallas else "xla"
        loss = MultiResolutionSTFTLoss(
            (512, 1024, 2048), (50, 120, 240), (240, 600, 1200),
            sample_rate=16000, perceptual_weighting=True, use_pallas=pallas,
        )

        def fwd(xx):
            return xx + 0.0 * loss(xx, y)

        timeit(f"mstft fwd ({tag})", fwd, x)

        def grad_step(xx):
            g = jax.grad(lambda a: loss(a, y))(xx)
            return xx - 1e-9 * g

        timeit(f"mstft grad ({tag})", grad_step, x)


if __name__ == "__main__":
    main()
