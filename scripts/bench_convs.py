"""Micro-benchmark: fwd and vjp of the EBEN conv shapes on the real TPU.

Chained-dependency timing (see ablate_step.py). Identifies which conv
flavors hit the backend's lhs-dilated / layout pathologies.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_convs.py
"""

from __future__ import annotations

import time


def main() -> None:
    from vibravox_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vibravox_tpu.ops.conv import conv1d, conv_transpose1d

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    B = 32

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
        print(f"{name:44s} {dt * 1e3:8.2f} ms", flush=True)
        return dt

    def mk(shape):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * 0.1)

    cases = [
        # (name, x shape, w shape (k, cin/g, cout), stride, padding, dilation, groups)
        ("disc conv0 1->16 k15 s1", (B, 40560, 1), (15, 1, 16), 1, 7, 1, 1),
        ("disc conv1 16->64 k41 s4 g4", (B, 40560, 16), (41, 4, 64), 4, 20, 1, 4),
        ("disc conv2 64->256 k41 s4 g4", (B, 10140, 64), (41, 16, 256), 4, 20, 1, 4),
        ("disc conv3 256->1024 k41 s4 g4", (B, 2535, 256), (41, 64, 1024), 4, 20, 1, 4),
        ("disc conv4 1024->1024 k41 s4 g4", (B, 634, 1024), (41, 256, 1024), 4, 20, 1, 4),
        ("gen enc conv 32->64 k4 s2", (B, 10140, 32), (4, 32, 64), 2, 1, 1, 1),
        ("gen enc conv 64->128 k8 s4", (B, 5070, 64), (8, 64, 128), 4, 3, 1, 1),
        ("gen enc conv 128->256 k16 s8", (B, 1268, 128), (16, 128, 256), 8, 7, 1, 1),
        ("residual dilated 16ch k3 d9", (B, 5070, 16), (3, 16, 16), 1, "same", 9, 1),
        ("pqmf analysis 1->4 k32 s4", (B, 40560, 1), (32, 1, 4), 4, 14, 1, 1),
    ]

    for name, xs, ws, stride, pad, dil, groups in cases:
        x = mk(xs)
        w = mk(ws)

        def fwd(xx, w=w, stride=stride, pad=pad, dil=dil, groups=groups):
            y = conv1d(xx, w, stride=stride, padding=pad, dilation=dil, groups=groups)
            return xx + 1e-30 * jnp.sum(y).astype(xx.dtype)

        timeit(f"{name} fwd", fwd, x)

        def grad_step(xx, w=w, stride=stride, pad=pad, dil=dil, groups=groups):
            def loss(a, ww):
                y = conv1d(a, ww, stride=stride, padding=pad, dilation=dil, groups=groups)
                return jnp.sum(y * y)

            dx, dw = jax.grad(loss, argnums=(0, 1))(xx, w)
            return xx - 1e-30 * dx - 1e-30 * jnp.sum(dw).astype(xx.dtype)

        timeit(f"{name} grad", grad_step, x)

    tcases = [
        ("gen dec convT 256->128 k16 s8", (B, 159, 256), (256, 128, 16), 8, 4),
        ("gen dec convT 128->64 k8 s4", (B, 1268, 128), (128, 64, 8), 4, 2),
        ("gen dec convT 64->32 k4 s2", (B, 5070, 64), (64, 32, 4), 2, 1),
    ]
    for name, xs, ws, stride, pad in tcases:
        x = mk(xs)
        w = mk(ws)

        def fwd(xx, w=w, stride=stride, pad=pad):
            y = conv_transpose1d(xx, w, stride=stride, padding=pad)
            return xx + 1e-30 * jnp.sum(y).astype(xx.dtype)

        timeit(f"{name} fwd", fwd, x)

        def grad_step(xx, w=w, stride=stride, pad=pad):
            def loss(a, ww):
                y = conv_transpose1d(a, ww, stride=stride, padding=pad)
                return jnp.sum(y * y)

            dx, dw = jax.grad(loss, argnums=(0, 1))(xx, w)
            return xx - 1e-30 * dx - 1e-30 * jnp.sum(dw).astype(xx.dtype)

        timeit(f"{name} grad", grad_step, x)


if __name__ == "__main__":
    main()
