"""XLA-op-level profile of any bench task's train step.

Reuses bench.py's task builders, traces 5 steps, and attributes device-op
time by op name — prints wall time, total attributed time (their gap is
scheduling/dispatch overhead, which scales with op count), op count, and
the top consumers.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_task_step.py --task stp
  VIBRAVOX_BENCH_BATCH=32 ... --task mimi
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--task", default="mimi", choices=["eben", "stp", "mimi", "spkv"]
    )
    parser.add_argument("--top", type=int, default=40)
    args = parser.parse_args()

    from vibravox_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    import bench

    print("devices:", jax.devices(), flush=True)
    build, default_batch = bench._TASKS[args.task]
    batch_size = int(os.environ.get("VIBRAVOX_BENCH_BATCH", str(default_batch)))

    if args.task == "spkv":
        # inference step: the jitted ECAPA2 embed forward, chained like
        # bench._run_spkv
        import jax.numpy as jnp
        import numpy as np

        from vibravox_tpu.models.ecapa2 import ecapa2_from_config

        t = int(3.0 * 16000)
        model = ecapa2_from_config(
            compute_dtype=os.environ.get("VIBRAVOX_ECAPA2_DTYPE", "bfloat16")
        )
        x = jnp.asarray(
            np.random.default_rng(0).standard_normal((batch_size, t)).astype(np.float32)
        )
        params = jax.jit(model.init)(jax.random.key(0), x)

        @jax.jit
        def emb_step(x):
            emb = model.apply(params, x)
            return x + jnp.sum(emb) * 1e-30, emb

        for _ in range(3):
            x, emb = emb_step(x)
        float(jnp.sum(emb))
        t0 = time.perf_counter()
        for _ in range(10):
            x, emb = emb_step(x)
        float(jnp.sum(emb))
        wall_ms = (time.perf_counter() - t0) / 10 * 1e3
        print(f"spkv embed step: {wall_ms:.2f} ms wall", flush=True)

        trace_dir = "/tmp/spkv_step_trace"
        with jax.profiler.trace(trace_dir):
            for _ in range(5):
                x, emb = emb_step(x)
            jax.block_until_ready(emb)
    else:
        metric, dp, state, batch, audio_seconds = build(batch_size)

        for _ in range(3):
            state, logs = dp.train_step(state, batch)
            float(next(iter(logs.values())))

        t0 = time.perf_counter()
        s = state
        for _ in range(10):
            s, logs = dp.train_step(s, batch)
        float(next(iter(logs.values())))
        jax.block_until_ready(s)
        wall_ms = (time.perf_counter() - t0) / 10 * 1e3
        print(f"{args.task} train step: {wall_ms:.2f} ms wall", flush=True)

        trace_dir = f"/tmp/{args.task}_step_trace"
        with jax.profiler.trace(trace_dir):
            for _ in range(5):
                s, logs = dp.train_step(s, batch)
            jax.block_until_ready(s)

    path = max(
        glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime,
    )
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    ev = trace["traceEvents"]
    pid_names = {
        e["pid"]: e["args"]["name"]
        for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dev = {pid for pid, n in pid_names.items() if "TPU" in n}
    tot, args_by = {}, {}
    grand = 0.0
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in dev and "dur" in e:
            n = e.get("name", "?")
            # numeric-named rows are aggregate stream lanes, not ops
            if n.startswith("jit_") or n.isdigit():
                continue
            tot[n] = tot.get(n, 0) + e["dur"]
            grand += e["dur"]
            if "args" in e and n not in args_by:
                args_by[n] = e["args"]
    print(f"attributed device us/step: {grand/5:.0f} (wall {wall_ms*1e3:.0f} us; "
          f"gap = scheduling/dispatch)")
    top = sorted(tot.items(), key=lambda kv: -kv[1])
    print("num distinct ops:", len(top))
    for n, d in top[: args.top]:
        a = args_by.get(n, {})
        long = str(a.get("long_name", a.get("tf_op", "")))[:150]
        print(f"{d/5:9.0f} us {n[:40]:40s} {long}")


if __name__ == "__main__":
    main()
