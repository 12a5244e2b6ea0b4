"""XLA-op-level profile of the discriminator loss backward.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_disc_bwd.py
"""

from __future__ import annotations

import glob
import gzip
import json
import os


def main() -> None:
    from vibravox_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vibravox_tpu.losses.gan import HingeLoss
    from vibravox_tpu.models.eben_discriminator import DiscriminatorEBENMultiScales
    from vibravox_tpu.models.eben_generator import EBENGenerator
    from vibravox_tpu.ops.pqmf import PQMF

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    B = 32
    gen = EBENGenerator(m=4, n=32, p=2)
    t = gen.valid_length(40000)
    dtype = jnp.bfloat16
    enhanced = jnp.asarray(rng.standard_normal((B, t, 1)).astype(np.float32) * 0.1).astype(dtype)
    reference = jnp.asarray(rng.standard_normal((B, t, 1)).astype(np.float32) * 0.1).astype(dtype)
    pqmf = PQMF(decimation=4, kernel_size=32)
    dec_e = pqmf.analysis(enhanced)
    dec_r = pqmf.analysis(reference)

    disc = DiscriminatorEBENMultiScales(q=4, min_channels=24)
    params = jax.jit(disc.init)(jax.random.key(0), dec_r, reference)
    hinge = HingeLoss()

    def step(p):
        def loss(pp):
            emb_e = disc.apply(pp, dec_e, enhanced)
            emb_r = disc.apply(pp, dec_r, reference)
            return hinge(emb_r, 1) + hinge(emb_e, -1)

        g = jax.grad(loss)(p)
        return jax.tree_util.tree_map(lambda a, b: a - 1e-9 * b.astype(a.dtype), p, g)

    step = jax.jit(step)
    p = step(params)
    jax.block_until_ready(p)

    import time
    t0 = time.perf_counter()
    for _ in range(10):
        p = step(p)
    jax.block_until_ready(p)
    print(f"disc grad step: {(time.perf_counter()-t0)/10*1e3:.2f} ms", flush=True)

    trace_dir = "/tmp/disc_bwd_trace"
    with jax.profiler.trace(trace_dir):
        for _ in range(5):
            p = step(p)
        jax.block_until_ready(p)

    path = max(glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True),
               key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    ev = trace["traceEvents"]
    pid_names = {e["pid"]: e["args"]["name"] for e in ev
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = {pid for pid, n in pid_names.items() if "TPU" in n}
    tot, args_by = {}, {}
    grand = 0.0
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in dev and "dur" in e:
            n = e.get("name", "?")
            if n.startswith("jit_"):
                continue
            tot[n] = tot.get(n, 0) + e["dur"]
            grand += e["dur"]
            if "args" in e and n not in args_by:
                args_by[n] = e["args"]
    print("total device op us/step:", grand / 5)
    top = sorted(tot.items(), key=lambda kv: -kv[1])
    print("num distinct ops:", len(top))
    for n, d in top[:30]:
        a = args_by.get(n, {})
        long = str(a.get("long_name", a.get("tf_op", "")))[:150]
        print(f"{d/5:9.0f} us {n[:36]:36s} {long}")


if __name__ == "__main__":
    main()
