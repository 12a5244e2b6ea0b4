"""Benchmark: train-step throughput (audio-seconds/sec/chip) + MFU.

Prints one JSON line per measured regime — {"metric", "task", "batch_size",
"value", "unit", "vs_baseline", "mfu", ...} — with the HEADLINE line LAST
(the driver parses the final line).  The default ``--task all`` measures
every family's recipe regime — stp b8, mimi b32, spkv b32, codec b32,
serve, then the EBEN pair (batch-32 recipe, batch-128 hardware ceiling) —
with per-task error isolation, so a regression in ANY family shows up in
the round artifact while the EBEN b128 headline stays the final line.
Pinning a single ``--task``/VIBRAVOX_BENCH_BATCH measures just that one
(EBEN alone still emits both regimes unless the batch is pinned).  Env
knobs: VIBRAVOX_BENCH_TASK, VIBRAVOX_BENCH_BATCH.

``mfu`` is measured FLOPs / step time / 197 TF/s (v5e bf16 peak); null when
cost analysis is unavailable.  The FLOP numerator is deflated to the
UNPACKED program's algorithmic work whenever packed space-to-depth kernels
are active (``flops_basis: "plain"``) — packing adds dense zero-block FLOPs
that would inflate MFU.  The deflator is the plain/packed ratio of two
CPU-compiled cost analyses of the same step (computed in a subprocess and
disk-cached — see ``_plain_flops_ratio``); the raw packed-program figure is
kept as ``mfu_packed_program``.  ``vs_baseline`` is the ratio against a
measured PyTorch-reference throughput stored in BENCH_BASELINE.json (key
``torch_reference_audio_sec_per_sec``); null until that measurement exists.
"""

from __future__ import annotations

import argparse
import json
import os
import time
from pathlib import Path

V5E_BF16_PEAK = 197e12


def _measure(dp, state, batch, n_steps=20, warmup=3):
    """Step timing that cross-checks itself against tunnel misbehaviour.

    Two measurements: (a) *serialized* — one loss-scalar readback per step
    (queue depth 1; provably executes every step, but folds the ~50 ms
    tunnel round trip into each one); (b) *pipelined* — steps queued with a
    single sync at the end (how a real input pipeline runs, and how all
    prior rounds measured).  The axon tunnel sometimes DROPS deeply queued
    dependent work (observed: 50 queued wav2vec2 steps = same wall time as
    10, then the readback raises InvalidArgument), which makes (b) absurdly
    fast.  So (b) is trusted only if the state's step counter read back
    after the sync equals the expected value — every task's ``train_step``
    increments ``state.step`` once, and the counter chains through the whole
    queued sequence, so a correct readback proves all n steps executed.
    A short step can then legitimately beat the serialized number by far
    more than the tunnel round trip.  Returns (dt_seconds, state,
    timing_mode).
    """
    import jax

    for _ in range(warmup):
        state, logs = dp.train_step(state, batch)
        float(next(iter(logs.values())))

    t0 = time.perf_counter()
    s = state
    for _ in range(n_steps):
        s, logs = dp.train_step(s, batch)
        float(next(iter(logs.values())))
    dt_serial = (time.perf_counter() - t0) / n_steps
    state = s

    dt = dt_serial
    mode = "serialized"
    try:
        step0 = int(jax.device_get(state.step))
        t0 = time.perf_counter()
        s = state
        for _ in range(n_steps):
            s, logs = dp.train_step(s, batch)
        float(next(iter(logs.values())))  # surfaces dropped/corrupted work
        jax.block_until_ready(s)
        dt_pipe = (time.perf_counter() - t0) / n_steps
        if int(jax.device_get(s.step)) == step0 + n_steps:
            dt, mode, state = dt_pipe, "pipelined", s
    except Exception:
        pass  # corrupted queue / no step counter: keep the serialized number
    return dt, state, mode


def _step_flops(dp, state, batch):
    """FLOPs of one compiled train step via XLA cost analysis (None on
    backends that don't report it)."""
    import jax

    from vibravox_tpu.parallel.mesh import shard_batch

    try:
        arrays, _ = dp.split_batch(batch)
        compiled = dp._train_step.lower(
            state, shard_batch(dp.mesh, arrays)
        ).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", -1.0))
        return flops if flops > 0 else None
    except Exception:
        return None


# Packed space-to-depth kernels trade dense zero-block FLOPs for lane
# occupancy, so cost analysis of the PACKED program overstates useful work
# (round-3 verdict: b32 EBEN mfu 0.22 reported vs ~0.155 real).  The honest
# MFU is plain-path FLOPs / packed-path time.
_PACKING_FLAGS = ("VIBRAVOX_PACKED_RU", "VIBRAVOX_PACKED_DISC", "VIBRAVOX_PACKED_SEANET")
# stp's packed levers are opt-in (default off) and lane-sliced FLOP-exact by
# construction, so the ratio subprocess only runs for stp when one is enabled.
_STP_PACKING_FLAGS = ("VIBRAVOX_PACKED_W2V2", "VIBRAVOX_POSCONV_BATCHED")

# Subprocess body: CPU-compiled cost analysis of the train step, packed
# (inherited flags) then plain (flags off).  Runs on XLA:CPU because the
# axon backend returns None from Lowered.cost_analysis, and because the
# LOWERING-stage count is pre-optimization (measured ~27% above the
# compiled count at EBEN b32 — CSE/simplification remove real FLOPs), so
# both legs must be COMPILED, and compiling the plain program on the TPU
# tunnel just for its FLOP count would cost ~10 cold minutes.  Using the
# same backend for both legs cancels any per-backend counting conventions;
# only the ratio leaves this process.
_RATIO_CHILD = r"""
import json, os, sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
os.chdir({repo!r})
from vibravox_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()
import bench
from vibravox_tpu.parallel.mesh import shard_batch


def compiled_flops():
    _, dp, state, batch, _ = bench._TASKS[{task!r}][0]({bs!r})
    arrays, _ = dp.split_batch(batch)
    c = dp._train_step.lower(state, shard_batch(dp.mesh, arrays)).compile()
    cost = c.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    return float(cost.get("flops", -1.0))


out = {{"packed": compiled_flops()}}
for k in {flags!r}:
    os.environ[k] = "0"
out["plain"] = compiled_flops()
print("RATIO_JSON:" + json.dumps(out))
"""


def _package_source_digest() -> str:
    """Content hash of the compute-path sources the FLOP ratio depends on."""
    import hashlib

    root = Path(__file__).parent
    h = hashlib.sha256()
    for p in sorted((root / "vibravox_tpu").rglob("*.py")) + [root / "bench.py"]:
        h.update(str(p.relative_to(root)).encode())
        h.update(p.read_bytes())
    return h.hexdigest()[:16]


def _plain_flops_ratio(task, batch_size):
    """plain/packed FLOP ratio of this task's train step at this batch size
    (<= 1.0; None when unavailable).  Computed by ``_RATIO_CHILD`` in a CPU
    subprocess and cached on disk keyed by (task, batch, packing env, jax
    version, package source hash) — packing gates are batch-dependent
    (e.g. packed residual stacks auto-disable past batch 64), so the ratio
    is per-regime.  VIBRAVOX_BENCH_PLAIN_FLOPS=0 disables the subprocess."""
    import subprocess
    import sys

    import jax

    if os.environ.get("VIBRAVOX_BENCH_PLAIN_FLOPS", "1") != "1":
        return None
    if task in ("eben", "mimi"):
        flags = _PACKING_FLAGS
    elif task == "stp" and any(
        os.environ.get(k, "0") == "1" for k in _STP_PACKING_FLAGS
    ):
        flags = _STP_PACKING_FLAGS
    else:  # tasks with no packed ops enabled: cost analysis is exact as-is
        return 1.0
    key = "|".join(
        [
            task,
            str(batch_size),
            *(f"{k}={os.environ.get(k, '')}" for k in flags),
            jax.__version__,
            _package_source_digest(),
        ]
    )
    cache_path = Path(
        os.environ.get(
            "VIBRAVOX_TPU_CACHE", os.path.expanduser("~/.cache/vibravox_tpu_xla")
        )
    ) / "plain_flops_ratio.json"
    try:
        cache = json.loads(cache_path.read_text())
    except Exception:
        cache = {}
    if key in cache:
        return cache[key]
    child = _RATIO_CHILD.format(
        repo=str(Path(__file__).parent), task=task, bs=batch_size, flags=tuple(flags)
    )
    try:
        proc = subprocess.run(
            [sys.executable, "-c", child], capture_output=True, text=True, timeout=900
        )
        line = next(
            l for l in proc.stdout.splitlines() if l.startswith("RATIO_JSON:")
        )
        out = json.loads(line[len("RATIO_JSON:"):])
        ratio = out["plain"] / out["packed"]
        if not (0 < ratio <= 1.001):
            return None
    except Exception:
        return None
    cache[key] = ratio
    try:
        cache_path.parent.mkdir(parents=True, exist_ok=True)
        cache_path.write_text(json.dumps(cache, indent=1))
    except OSError:
        pass
    return ratio


def _bench_eben(batch_size):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from vibravox_tpu.losses.gan import FeatureMatchingLoss, HingeLoss
    from vibravox_tpu.models.eben_discriminator import DiscriminatorEBENMultiScales
    from vibravox_tpu.models.eben_generator import EBENGenerator
    from vibravox_tpu.ops.stft import MultiResolutionSTFTLoss
    from vibravox_tpu.parallel.mesh import DataParallel, build_mesh
    from vibravox_tpu.tasks.eben import EBENTask

    sample_rate = 16000
    # throughput configuration: the step is partly op-count/overhead-bound on
    # this backend, so larger batches amortize it — measured r2: batch 32 →
    # 621 audio-s/s/chip, 64 → 793, 128 → 1471, 256 → 1386 (HBM pressure).
    # The reference's training recipe stays batch 32; this benchmarks the
    # hardware ceiling of the identical step function.
    seconds = 2.5
    task = EBENTask(
        sample_rate=sample_rate,
        generator=EBENGenerator(m=4, n=32, p=2),
        discriminator=DiscriminatorEBENMultiScales(q=4, min_channels=24),
        generator_optimizer=optax.adam(3e-4, b1=0.5, b2=0.9),
        discriminator_optimizer=optax.adam(3e-4, b1=0.5, b2=0.9),
        reconstructive_loss_freq_fn=MultiResolutionSTFTLoss(
            (512, 1024, 2048), (50, 120, 240), (240, 600, 1200),
            sample_rate=sample_rate, perceptual_weighting=True,
            # probe knob: run the DFT matmuls in the compute dtype (bf16)
            # instead of upcasting to f32 (~1e-2 relative loss noise)
            upcast_to_f32=os.environ.get("VIBRAVOX_BENCH_MSTFT_BF16", "0") != "1",
        ),
        feature_matching_loss_fn=FeatureMatchingLoss(),
        adversarial_loss_fn=HingeLoss(),
        dynamic_loss_balancing="ema",
        compute_dtype="bfloat16",
        # batch-regime-dependent (measured r3): optax.flatten wins slightly at
        # the b128 throughput config (+1.5%) but loses at the b32 recipe
        # (-6.7%: flat<->tiled relayout copies of the 23M-param disc) — same
        # crossover as packing/disc batching, so follow the same >64 rule
        flatten_optimizer=os.environ.get(
            "VIBRAVOX_FLATTEN_OPT", "1" if batch_size > 64 else "0"
        ) == "1",
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
    dp = DataParallel(task, build_mesh())
    state = dp.init_state(jax.random.key(0), batch)
    return "eben_gan_train_throughput", dp, state, batch, batch_size * t_samples / 16000


def _bench_stp(batch_size):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from vibravox_tpu.models.wav2vec2 import wav2vec2_for_ctc_from_config
    from vibravox_tpu.parallel.mesh import DataParallel, build_mesh
    from vibravox_tpu.tasks.wav2vec2_stp import Wav2Vec2STPTask

    # reference recipe: wav2vec2-base, batch 8 (configs/lightning_datamodule/
    # stp.yaml), ~3 s utterances padded to x128
    seconds = 3.0
    task = Wav2Vec2STPTask(
        wav2vec2_for_ctc=wav2vec2_for_ctc_from_config(),  # default = base
        optimizer=optax.adam(1e-5),
        compute_dtype="bfloat16",
        # measurement knob: single fused update over one flat vector vs
        # per-leaf adam (see tasks/eben.py::flatten_optimizer)
        flatten_optimizer=os.environ.get("VIBRAVOX_BENCH_FLATTEN", "0") == "1",
    )
    t = int(seconds * 16000) // 128 * 128
    rng = np.random.default_rng(0)
    ids = np.full((batch_size, 128), -100, np.int64)
    ids[:, :40] = rng.integers(0, 35, size=(batch_size, 40))
    batch = {
        "audio": jnp.asarray(rng.standard_normal((batch_size, t)).astype(np.float32)),
        "phonemes_ids": jnp.asarray(ids),
    }
    dp = DataParallel(task, build_mesh())
    state = dp.init_state(jax.random.key(0), batch)
    return "wav2vec2_ctc_train_throughput", dp, state, batch, batch_size * t / 16000


def _bench_mimi(batch_size):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from vibravox_tpu.models.mimi.mimi import Mimi
    from vibravox_tpu.parallel.mesh import DataParallel, build_mesh
    from vibravox_tpu.tasks.regressive_mimi import RegressiveMimiTask

    # full-size Mimi codec (24 kHz), encoder-side latent-regression step
    # (regressive_mimi.py:24-38); bf16 matmuls (f32 is software-emulated).
    # Default batch 32 = the reference recipe (the BWE datamodule feeds this
    # task — configs/lightning_datamodule/bwe.yaml batch_size: 32)
    mimi = Mimi(compute_dtype="bfloat16")
    task = RegressiveMimiTask(mimi=mimi, optimizer=optax.adam(1e-4))
    t = mimi.valid_length(int(2.0 * 24000))
    rng = np.random.default_rng(0)
    ref = rng.standard_normal((batch_size, t, 1)).astype(np.float32) * 0.1
    batch = {
        "audio_body_conducted": jnp.asarray(ref * 0.5),
        "audio_airborne": jnp.asarray(ref),
    }
    dp = DataParallel(task, build_mesh())
    state = dp.init_state(jax.random.key(0), batch)
    return "mimi_regressive_train_throughput", dp, state, batch, batch_size * t / 24000


def _bench_serve(batch_size):
    """Serving latency/throughput: returns a sentinel tuple — handled
    specially in main() (request/response path, not train-step timing)."""
    return ("serve", batch_size)


def _bench_spkv(batch_size):
    """Sentinel like serve: the SPKV test epoch is inference-only (embed both
    sides of every trial pair — ref ecapa2.py:88-119), so it is timed as a
    jitted embedder forward, not a train step."""
    return ("spkv", batch_size)


def _bench_codec(batch_size):
    """Sentinel like spkv: the Mimi codec round trip (encode → RVQ →
    decode) is inference-only — the SE-eval and codec-serving surface."""
    return ("codec", batch_size)


_TASKS = {
    "eben": (_bench_eben, 128),
    "stp": (_bench_stp, 8),
    "mimi": (_bench_mimi, 32),
    "serve": (_bench_serve, 8),
    "spkv": (_bench_spkv, 32),
    "codec": (_bench_codec, 32),
}


def _run_spkv(batch_size) -> None:
    """ECAPA2 embedding throughput: 3-s 16 kHz utterances through the full
    embedder (log-mel front-end + fwSE trunk + SE-Res2Net + attentive
    pooling).  Chained-dependency timing: each batch carries an
    imperceptible function of the previous embeddings so the tunnel cannot
    reorder, drop, or hoist steps; one readback at the end validates the
    chain."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vibravox_tpu.models.ecapa2 import ecapa2_from_config

    seconds = 3.0
    t = int(seconds * 16000)
    # bf16 trunk by default — the TPU analog of the reference's fp16
    # inference (`ecapa2.py:40` .half()); measured +35.7% at b32
    # (docs/PERF.md ECAPA2 dossier).  f32 = checkpoint-parity mode.
    model = ecapa2_from_config(
        compute_dtype=os.environ.get("VIBRAVOX_ECAPA2_DTYPE", "bfloat16")
    )
    x0 = jnp.asarray(np.random.default_rng(0).standard_normal((batch_size, t)).astype(np.float32))
    params = jax.jit(model.init)(jax.random.key(0), x0)

    @jax.jit
    def step(x):
        emb = model.apply(params, x)
        # non-simplifiable dependency for the next batch (CLAUDE.md timing)
        return x + jnp.sum(emb) * 1e-30, emb

    x = x0
    for _ in range(3):  # warmup / compile
        x, emb = step(x)
    float(jnp.sum(emb))
    n_steps = 20
    t0 = time.perf_counter()
    for _ in range(n_steps):
        x, emb = step(x)
    float(jnp.sum(emb))  # single sync; chain guarantees all steps ran
    dt = (time.perf_counter() - t0) / n_steps

    n_chips = jax.device_count()
    mfu = None
    try:
        cost = step.lower(x).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", -1.0))
        if flops > 0:
            mfu = flops / dt / (n_chips * V5E_BF16_PEAK)
    except Exception:
        pass
    print(
        json.dumps(
            {
                "metric": "ecapa2_embed_throughput",
                "task": "spkv",
                "batch_size": batch_size,
                "value": round(batch_size * seconds / dt / n_chips, 3),
                "unit": "audio_sec/sec/chip",
                "vs_baseline": None,
                "mfu": round(mfu, 4) if mfu else None,
                "timing": "chained",
            }
        )
    )


def _run_codec(batch_size) -> None:
    """Mimi codec round-trip throughput: waveform → unquantized latents →
    RVQ → waveform (``encode_to_latent`` + ``decode_latent``, the eval-epoch
    and codec-serving path — ref regressive_mimi.py:57-74).  Exercises both
    packed SEANet segments (``ops/packed_seanet.py``).  Chained-dependency
    timing as in spkv."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vibravox_tpu.models.mimi.mimi import Mimi

    seconds = 2.0
    mimi = Mimi(compute_dtype="bfloat16")
    t = mimi.valid_length(int(seconds * 24000))
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(
        rng.standard_normal((batch_size, t, 1)).astype(np.float32) * 0.1)

    @jax.jit
    def step(params, x):
        latent = mimi.module.apply(params, x, method="encode_to_latent")
        y = mimi.module.apply(params, latent, method="decode_latent")
        return x + jnp.sum(y) * 1e-30, y

    params = mimi.params
    x = x0
    for _ in range(3):
        x, y = step(params, x)
    float(jnp.sum(y))
    n_steps = 20
    t0 = time.perf_counter()
    for _ in range(n_steps):
        x, y = step(params, x)
    float(jnp.sum(y))  # single sync; the chain guarantees all steps ran
    dt = (time.perf_counter() - t0) / n_steps

    n_chips = jax.device_count()
    mfu = None
    try:
        cost = step.lower(params, x).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", -1.0))
        if flops > 0:
            mfu = flops / dt / (n_chips * V5E_BF16_PEAK)
    except Exception:
        pass
    print(
        json.dumps(
            {
                "metric": "mimi_codec_roundtrip_throughput",
                "task": "codec",
                "batch_size": batch_size,
                "value": round(batch_size * seconds / dt / n_chips, 3),
                "unit": "audio_sec/sec/chip",
                "vs_baseline": None,
                "mfu": round(mfu, 4) if mfu else None,
                "timing": "chained",
            }
        )
    )


def _run_serve(batch_size) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vibravox_tpu.models.eben_generator import EBENGenerator
    from vibravox_tpu.serving import EnhanceServer

    model = EBENGenerator(m=4, n=32, p=2)
    t0 = model.valid_length(16000)
    params = model.init(jax.random.key(0), jnp.zeros((1, t0, 1)))
    server = EnhanceServer(
        model, params, max_batch=batch_size, max_delay_ms=2.0,
        bucket_seconds=(1.0,), compute_dtype="bfloat16",
    )
    server.warmup()
    rng = np.random.default_rng(0)
    n_requests = 64
    t_start = time.perf_counter()
    futs = [
        server.submit(rng.standard_normal(server.buckets[0]).astype(np.float32) * 0.1)
        for _ in range(n_requests)
    ]
    for f in futs:
        f.result(timeout=300)
    wall = time.perf_counter() - t_start
    stats = server.stats()
    server.close()
    print(
        json.dumps(
            {
                "metric": "eben_serving_latency_p50",
                "task": "serve",
                "batch_size": batch_size,
                "value": round(stats["latency_p50_ms"], 3),
                "unit": "ms",
                "vs_baseline": None,
                "mfu": None,
                "extra": {
                    "p95_ms": round(stats["latency_p95_ms"], 3),
                    "audio_sec_per_sec": round(stats["audio_seconds"] / wall, 3),
                    "requests": n_requests,
                },
            }
        )
    )


def _run_one(task: str, batch_size=None) -> None:
    """Measure one task at one batch size (or the EBEN pair) and print its
    JSON line(s).  Factored out of main() so ``--task all`` can iterate."""
    import jax

    build, default_batch = _TASKS[task]
    if batch_size is None:
        batch_size = int(os.environ.get("VIBRAVOX_BENCH_BATCH", str(default_batch)))
    if task == "serve":
        _run_serve(batch_size)
        return
    if task == "spkv":
        _run_spkv(batch_size)
        return
    if task == "codec":
        _run_codec(batch_size)
        return

    # EBEN emits BOTH regimes unless the batch was pinned explicitly: the
    # reference's actual training recipe (batch 32 — ref configs/
    # lightning_datamodule/bwe.yaml:8) first, then the batch-128 hardware
    # -ceiling headline LAST (the driver parses the final JSON line)
    if task == "eben" and "VIBRAVOX_BENCH_BATCH" not in os.environ:
        batches = [32, batch_size] if batch_size != 32 else [32]
    else:
        batches = [batch_size]

    for bs in batches:
        metric, dp, state, batch, audio_seconds = build(bs)

        n_chips = jax.device_count()
        dt, state, timing_mode = _measure(dp, state, batch)
        throughput = audio_seconds / dt / n_chips

        # honest MFU: algorithmic (unpacked-program) FLOPs over the packed
        # program's measured time; `mfu_packed_program` keeps the raw
        # cost-analysis number for comparison when the two differ
        packed_flops = _step_flops(dp, state, batch)
        ratio = _plain_flops_ratio(task, bs) if packed_flops else None
        plain_flops = packed_flops * ratio if (packed_flops and ratio) else None
        flops = plain_flops or packed_flops
        mfu = flops / dt / (n_chips * V5E_BF16_PEAK) if flops else None
        mfu_packed = (
            packed_flops / dt / (n_chips * V5E_BF16_PEAK) if packed_flops else None
        )

        vs_baseline = None
        baseline_path = Path(__file__).parent / "BENCH_BASELINE.json"
        if task == "eben" and baseline_path.exists():
            base = json.loads(baseline_path.read_text())
            ref = base.get("torch_reference_audio_sec_per_sec")
            if ref:
                vs_baseline = throughput / float(ref)

        record = {
            "metric": metric,
            "task": task,
            "batch_size": bs,
            "value": round(throughput, 3),
            "unit": "audio_sec/sec/chip",
            "vs_baseline": round(vs_baseline, 3) if vs_baseline else None,
            "mfu": round(mfu, 4) if mfu else None,
            "flops_basis": "plain" if plain_flops else ("packed" if packed_flops else None),
            "timing": timing_mode,
        }
        if (
            mfu_packed is not None
            and plain_flops is not None
            and abs(mfu_packed - mfu) > 5e-4
        ):
            record["mfu_packed_program"] = round(mfu_packed, 4)
        print(json.dumps(record), flush=True)


# ``--task all`` order: every non-EBEN recipe regime first (so a regression
# in any family lands in the round artifact), the EBEN pair last so the
# b128 ceiling stays the final JSON line the driver parses as the headline.
_ALL_ORDER = ("stp", "mimi", "spkv", "codec", "serve", "eben")


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--task", default=os.environ.get("VIBRAVOX_BENCH_TASK", "all"),
        choices=sorted(_TASKS) + ["all"],
    )
    args = parser.parse_args(argv)

    from vibravox_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()

    if args.task != "all":
        _run_one(args.task)
        return

    import sys
    import traceback

    t_wall = time.perf_counter()
    for task in _ALL_ORDER:
        if task == "eben":
            _run_one(task)  # headline: let a failure here fail the run
        else:
            try:
                _run_one(task)
            except Exception:
                # per-task isolation: a broken family must not silence the
                # headline, but its absence from the artifact IS the signal
                print(f"bench: task {task!r} FAILED:", file=sys.stderr)
                traceback.print_exc()
    print(
        f"bench: all tasks done in {time.perf_counter() - t_wall:.0f} s",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
