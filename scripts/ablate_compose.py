"""Composition ablation: why is grad(mstft(gen(x))) >> grad parts?

Round-2 finding: standalone, the generator's full fwd+bwd is ~4 ms and the
3-resolution mstft loss grad is ~7 ms, but the composed program costs ~32 ms.
This script isolates the junction. Cases:

  A  grad of L1(gen(params))                      (baseline, ~4 ms)
  B  grad of mstft(x) w.r.t. x                    (baseline, ~7 ms)
  C  grad of mstft(gen(params))                   (the 32 ms composition)
  D  C with optimization_barrier at the junction
  E  C with the Pallas fwd+bwd mstft kernels
  F  grad of mstft(tanh(x*w)) trivial "generator"
  G  grad of L1+mstft (the real loss pair)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ablate_compose.py
"""

from __future__ import annotations

import time


def main() -> None:
    from vibravox_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vibravox_tpu.models.eben_generator import EBENGenerator
    from vibravox_tpu.ops.stft import MultiResolutionSTFTLoss

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    B = 32
    gen = EBENGenerator(m=4, n=32, p=2)
    t = gen.valid_length(40000)
    x = jnp.asarray(rng.standard_normal((B, t, 1)).astype(np.float32) * 0.1).astype(jnp.bfloat16)
    y = jnp.asarray(rng.standard_normal((B, t, 1)).astype(np.float32) * 0.1).astype(jnp.bfloat16)
    params = jax.jit(gen.init)(jax.random.key(0), x)

    mstft = MultiResolutionSTFTLoss(
        (512, 1024, 2048), (50, 120, 240), (240, 600, 1200),
        sample_rate=16000, perceptual_weighting=True, use_pallas=False,
    )
    mstft_pallas = MultiResolutionSTFTLoss(
        (512, 1024, 2048), (50, 120, 240), (240, 600, 1200),
        sample_rate=16000, perceptual_weighting=True, use_pallas=True,
    )

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
        print(f"{name:46s} {dt * 1e3:8.2f} ms", flush=True)
        return dt

    def step(p, grads, eps=1e-9):
        return jax.tree_util.tree_map(lambda a, g: a - eps * g.astype(a.dtype), p, grads)

    # A: L1 through the generator
    def case_a(p):
        def loss(pp):
            enh, _ = gen.apply(pp, x)
            return jnp.mean(jnp.abs(enh.astype(jnp.float32) - y.astype(jnp.float32)))
        return step(p, jax.grad(loss)(p))

    timeit("A  grad L1(gen)", case_a, params)

    # B: mstft w.r.t. the signal only
    def case_b(xx):
        g = jax.grad(lambda a: mstft(a, y))(xx)
        return xx - 1e-9 * g.astype(xx.dtype)

    timeit("B  grad mstft(x)", case_b, x)

    # C: the composition
    def case_c(p):
        def loss(pp):
            enh, _ = gen.apply(pp, x)
            return mstft(enh, y)
        return step(p, jax.grad(loss)(p))

    timeit("C  grad mstft(gen)", case_c, params)

    # D: optimization barrier at the junction
    def case_d(p):
        def loss(pp):
            enh, _ = gen.apply(pp, x)
            enh = jax.lax.optimization_barrier(enh)
            return mstft(enh, y)
        return step(p, jax.grad(loss)(p))

    timeit("D  grad mstft(barrier(gen))", case_d, params)

    # E: pallas mstft composed with the generator
    def case_e(p):
        def loss(pp):
            enh, _ = gen.apply(pp, x)
            return mstft_pallas(enh, y)
        return step(p, jax.grad(loss)(p))

    try:
        timeit("E  grad pallas_mstft(gen)", case_e, params)
    except Exception as e:
        print("E  FAILED:", type(e).__name__, str(e)[:200], flush=True)

    # F: trivial parameterized "generator"
    w0 = jnp.ones((), jnp.bfloat16)

    def case_f(w):
        def loss(ww):
            return mstft(x * ww, y)
        return w - 1e-9 * jax.grad(loss)(w).astype(w.dtype)

    timeit("F  grad mstft(x*w)", case_f, w0)

    # G: both losses through the generator (the real pairing)
    def case_g(p):
        def loss(pp):
            enh, _ = gen.apply(pp, x)
            l1 = jnp.mean(jnp.abs(enh.astype(jnp.float32) - y.astype(jnp.float32)))
            return l1 + mstft(enh, y)
        return step(p, jax.grad(loss)(p))

    timeit("G  grad (L1+mstft)(gen)", case_g, params)


if __name__ == "__main__":
    main()
