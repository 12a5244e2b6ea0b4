"""Interleaved same-session A/B of an env-flag lever on a full bench task.

The repo's measurement rule (docs/PERF.md): standalone component timings lie
in BOTH directions on this backend, and session-to-session drift is ±1.5 ms —
so a lever verdict requires the full task step, flag OFF and ON, measured in
ALTERNATING reps within one session.  This script builds both step functions
(env flag set before each build — the flags are read at trace time), warms
both, then interleaves timed reps A,B,A,B,... using ``bench._measure``'s
validated timing.

Usage (PYTHONPATH=/root/repo:/root/.axon_site):
    python scripts/ab_flag.py --task eben --batch 32 --flag VIBRAVOX_INT8_DISC
    python scripts/ab_flag.py --task mimi --batch 32 --flag VIBRAVOX_MIMI_SUBTREE_OPT
"""

from __future__ import annotations

import argparse
import json
import os
import statistics


def _ab_spkv(args) -> None:
    """ECAPA2 embed-path A/B (inference step, chained-dependency timing)."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vibravox_tpu.models.ecapa2 import ecapa2_from_config

    t = int(3.0 * 16000)
    x0 = jnp.asarray(
        np.random.default_rng(0).standard_normal((args.batch, t)).astype(np.float32)
    )

    arms = {}
    for name, value in (("off", args.off), ("on", args.on)):
        os.environ[args.flag] = value
        model = ecapa2_from_config(
            compute_dtype=os.environ.get("VIBRAVOX_ECAPA2_DTYPE", "float32")
        )
        params = jax.jit(model.init)(jax.random.key(0), x0)

        @jax.jit
        def step(x, params=params, model=model):
            emb = model.apply(params, x)
            return x + jnp.sum(emb) * 1e-30, emb

        x, emb = step(x0)
        float(jnp.sum(emb))  # compile + sync
        arms[name] = dict(step=step, x=x)
        print(f"built {name} ({args.flag}={value})", flush=True)

    times = {"off": [], "on": []}
    for rep in range(args.reps):
        for name in ("off", "on"):
            a = arms[name]
            x = a["x"]
            t0 = time.perf_counter()
            for _ in range(args.steps):
                x, emb = a["step"](x)
            float(jnp.sum(emb))
            dt = (time.perf_counter() - t0) / args.steps
            a["x"] = x
            times[name].append(dt)
            print(
                f"rep {rep} {name}: {dt*1e3:.2f} ms/batch "
                f"({args.batch*3.0/dt:.0f} audio-s/s)",
                flush=True,
            )

    med_off = statistics.median(times["off"])
    med_on = statistics.median(times["on"])
    print(
        json.dumps(
            {
                "task": "spkv", "batch": args.batch, "flag": args.flag,
                "median_off_ms": round(med_off * 1e3, 2),
                "median_on_ms": round(med_on * 1e3, 2),
                "speedup_on_vs_off": round(med_off / med_on, 4),
                "throughput_off": round(args.batch * 3.0 / med_off, 1),
                "throughput_on": round(args.batch * 3.0 / med_on, 1),
            }
        ),
        flush=True,
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="eben")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--flag", required=True)
    ap.add_argument("--on", default="1", help="flag value for the B arm")
    ap.add_argument("--off", default="0", help="flag value for the A arm")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    from vibravox_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    import bench

    if args.task == "spkv":
        _ab_spkv(args)
        return

    build = bench._TASKS[args.task][0]

    arms = {}
    for name, value in (("off", args.off), ("on", args.on)):
        os.environ[args.flag] = value
        metric, dp, state, batch, audio_seconds = build(args.batch)
        # warm (compiles)
        dt, state, mode = bench._measure(dp, state, batch, n_steps=3, warmup=2)
        arms[name] = dict(dp=dp, state=state, batch=batch, audio=audio_seconds)
        print(f"built {name} ({args.flag}={value}), warm dt={dt*1e3:.1f} ms", flush=True)

    times = {"off": [], "on": []}
    for rep in range(args.reps):
        for name in ("off", "on"):
            a = arms[name]
            dt, a["state"], mode = bench._measure(
                a["dp"], a["state"], a["batch"], n_steps=args.steps, warmup=1
            )
            times[name].append(dt)
            print(
                f"rep {rep} {name}: {dt*1e3:.2f} ms/step "
                f"({a['audio']/dt:.0f} audio-s/s, {mode})",
                flush=True,
            )

    med_off = statistics.median(times["off"])
    med_on = statistics.median(times["on"])
    print(
        json.dumps(
            {
                "task": args.task,
                "batch": args.batch,
                "flag": args.flag,
                "median_off_ms": round(med_off * 1e3, 2),
                "median_on_ms": round(med_on * 1e3, 2),
                "speedup_on_vs_off": round(med_off / med_on, 4),
                "throughput_off": round(arms["off"]["audio"] / med_off, 1),
                "throughput_on": round(arms["on"]["audio"] / med_on, 1),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
