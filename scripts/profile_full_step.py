"""XLA-op-level profile of the FULL EBEN GAN train step (batch 32).

Groups device-op time by op-name family so the step's time budget is
attributable (gen fwd / disc fwd / dW / dx / elementwise / reduces / copies).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_full_step.py
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import time


def main() -> None:
    from vibravox_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from vibravox_tpu.losses.gan import FeatureMatchingLoss, HingeLoss
    from vibravox_tpu.models.eben_discriminator import DiscriminatorEBENMultiScales
    from vibravox_tpu.models.eben_generator import EBENGenerator
    from vibravox_tpu.ops.stft import MultiResolutionSTFTLoss
    from vibravox_tpu.tasks.eben import EBENTask

    print("devices:", jax.devices(), flush=True)
    sample_rate, batch_size, seconds = 16000, 32, 2.5
    task = EBENTask(
        sample_rate=sample_rate,
        generator=EBENGenerator(m=4, n=32, p=2),
        discriminator=DiscriminatorEBENMultiScales(q=4, min_channels=24),
        generator_optimizer=optax.adam(3e-4, b1=0.5, b2=0.9),
        discriminator_optimizer=optax.adam(3e-4, b1=0.5, b2=0.9),
        reconstructive_loss_freq_fn=MultiResolutionSTFTLoss(
            (512, 1024, 2048), (50, 120, 240), (240, 600, 1200),
            sample_rate=sample_rate, perceptual_weighting=True,
        ),
        feature_matching_loss_fn=FeatureMatchingLoss(),
        adversarial_loss_fn=HingeLoss(),
        dynamic_loss_balancing="ema",
        compute_dtype="bfloat16",
    )
    t_samples = task.generator.valid_length(int(seconds * sample_rate))
    rng = np.random.default_rng(0)
    batch = {
        "audio_body_conducted": jnp.asarray(
            rng.standard_normal((batch_size, t_samples, 1)).astype(np.float32) * 0.1
        ),
        "audio_airborne": jnp.asarray(
            rng.standard_normal((batch_size, t_samples, 1)).astype(np.float32) * 0.1
        ),
    }
    state = jax.jit(task.init_state)(jax.random.key(0), batch)
    step = jax.jit(task.train_step, donate_argnums=())

    state2, logs = step(state, batch)
    jax.block_until_ready(state2)
    t0 = time.perf_counter()
    s = state
    for _ in range(10):
        s, logs = step(s, batch)
    jax.block_until_ready(s)
    print(f"full step: {(time.perf_counter()-t0)/10*1e3:.2f} ms", flush=True)

    trace_dir = "/tmp/full_step_trace"
    with jax.profiler.trace(trace_dir):
        for _ in range(5):
            s, logs = step(s, batch)
        jax.block_until_ready(s)

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
            if n.startswith("jit_") or n in ("0", "1", "2", "3", "4"):
                continue
            tot[n] = tot.get(n, 0) + e["dur"]
            grand += e["dur"]
            if "args" in e and n not in args_by:
                args_by[n] = e["args"]
    print("total attributed device-op us/step:", grand / 5)
    print("num distinct ops:", len(tot))

    # family grouping by op-name prefix
    fam = {}
    for n, d in tot.items():
        key = n.split(".")[0]
        fam[key] = fam.get(key, 0) + d
    print("\n-- by family --")
    for k, d in sorted(fam.items(), key=lambda kv: -kv[1])[:15]:
        print(f"{d/5:9.0f} us {k}")

    print("\n-- top ops --")
    for n, d in sorted(tot.items(), key=lambda kv: -kv[1])[:35]:
        a = args_by.get(n, {})
        long = str(a.get("long_name", a.get("tf_op", "")))[:130]
        print(f"{d/5:9.0f} us {n[:36]:36s} {long}")


if __name__ == "__main__":
    main()
