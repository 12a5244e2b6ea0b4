"""XLA-op-level profile of the generator L1 backward (the 28 ms mystery).

Captures a jax profiler trace of grad(L1(gen)) steps and prints the top ops
by total self time, parsed from the trace protobuf/json.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_gen_bwd.py
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

    from vibravox_tpu.models.eben_generator import EBENGenerator

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    B = 32
    gen = EBENGenerator(m=4, n=32, p=2)
    t = gen.valid_length(40000)
    x = jnp.asarray(rng.standard_normal((B, t, 1)).astype(np.float32) * 0.1).astype(jnp.bfloat16)
    y = jnp.asarray(rng.standard_normal((B, t, 1)).astype(np.float32) * 0.1).astype(jnp.bfloat16)
    params = jax.jit(gen.init)(jax.random.key(0), x)

    def step(p):
        def loss(pp):
            enh, _ = gen.apply(pp, x)
            return jnp.mean(jnp.abs(enh.astype(jnp.float32) - y.astype(jnp.float32)))

        g = jax.grad(loss)(p)
        return jax.tree_util.tree_map(lambda a, b: a - 1e-9 * b.astype(a.dtype), p, g)

    step = jax.jit(step)
    p = step(params)
    jax.block_until_ready(p)

    trace_dir = "/tmp/gen_bwd_trace"
    with jax.profiler.trace(trace_dir):
        for _ in range(5):
            p = step(p)
        jax.block_until_ready(p)

    # parse the chrome trace for device-op durations
    candidates = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True)
    if not candidates:
        print("no trace file found under", trace_dir)
        return
    path = max(candidates, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device lanes: pick pids whose name mentions TPU / device
    pid_names = {e["pid"]: e["args"]["name"] for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name" and "args" in e}
    device_pids = {pid for pid, name in pid_names.items()
                   if "TPU" in name or "/device" in name.lower() or "Chip" in name}
    totals = {}
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in device_pids and "dur" in e:
            name = e.get("name", "?")
            totals[name] = totals.get(name, 0.0) + e["dur"]
    top = sorted(totals.items(), key=lambda kv: -kv[1])[:40]
    print(f"pids: {pid_names}", flush=True)
    print("top device ops (total us over 5 steps):")
    for name, dur in top:
        print(f"  {dur/5:10.0f} us/step  {name[:110]}")


if __name__ == "__main__":
    main()
