"""Multi-host dry run: N CPU processes, one global mesh, one sharded GAN step.

Validates the `jax.distributed` scaffolding (``parallel/distributed.py``)
without pod hardware: the parent spawns N worker processes; each worker
forces the CPU platform with D local virtual devices, joins the
coordination service, builds the global (N*D)-device mesh, and runs a full
EBEN GAN train step through ``DataParallel`` — per-process local batches
are assembled into the global sharded array exactly as a per-host loader
shard would be.  This is the TPU-native stand-in for the reference's
DDP/SLURM multi-node path (``configs/trainer/ddp.yaml:4-8``,
``slurm/*.sh``).

Usage:
    python scripts/multihost_dryrun.py [--nproc 2] [--devices-per-proc 2]
Exit code 0 and one MULTIHOST_OK line per worker on success.
"""

from __future__ import annotations

import argparse
import os
import socket
import subprocess
import sys


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def worker(process_id: int, num_processes: int, port: int, devices_per_proc: int) -> None:
    # force the virtual CPU backend BEFORE any jax import (CLAUDE.md: the
    # axon sitecustomize otherwise hijacks the platform selection)
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={devices_per_proc} "
        # raise the CPU-collective hang-detector deadline: emulated devices
        # on a starved host can take >40 s to reach a rendezvous (see
        # tests/conftest.py)
        "--xla_cpu_collective_timeout_seconds=1200 "
        "--xla_cpu_collective_call_warn_stuck_timeout_seconds=600 "
        "--xla_cpu_collective_call_terminate_timeout_seconds=1200 "
        + os.environ.get("XLA_FLAGS", "")
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    import jax

    jax.config.update("jax_platforms", "cpu")

    # NOTE: no persistent compilation cache here — XLA:CPU AOT cache loads
    # fail a machine-feature check on this build (see tests/conftest.py) and
    # kill the worker; cold-compiling is slow but reliable.

    from vibravox_tpu.parallel.distributed import initialize_distributed

    assert initialize_distributed(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=num_processes,
        process_id=process_id,
    )
    assert jax.process_count() == num_processes
    assert jax.device_count() == num_processes * devices_per_proc

    import numpy as np
    import jax.numpy as jnp
    import optax

    from vibravox_tpu.losses.gan import FeatureMatchingLoss, HingeLoss
    from vibravox_tpu.models.eben_discriminator import DiscriminatorEBENMultiScales
    from vibravox_tpu.models.eben_generator import EBENGenerator
    from vibravox_tpu.ops.stft import MultiResolutionSTFTLoss
    from vibravox_tpu.parallel.mesh import DataParallel, build_mesh
    from vibravox_tpu.tasks.eben import EBENTask

    task = EBENTask(
        sample_rate=16000,
        generator=EBENGenerator(m=4, n=32, p=2),
        discriminator=DiscriminatorEBENMultiScales(q=4, min_channels=8),
        generator_optimizer=optax.adam(3e-4, b1=0.5, b2=0.9),
        discriminator_optimizer=optax.adam(3e-4, b1=0.5, b2=0.9),
        reconstructive_loss_freq_fn=MultiResolutionSTFTLoss(
            (512,), (50,), (240,), sample_rate=16000, perceptual_weighting=True,
            use_pallas=False,
        ),
        feature_matching_loss_fn=FeatureMatchingLoss(),
        adversarial_loss_fn=HingeLoss(),
        dynamic_loss_balancing="ema",
    )

    # per-process local batch: one sample per local device, DIFFERENT values
    # per process (as a per-host loader shard would be)
    rng = np.random.default_rng(1234 + process_id)
    t = 4064
    local = {
        "audio_body_conducted": jnp.asarray(
            rng.standard_normal((devices_per_proc, t, 1)).astype(np.float32) * 0.1
        ),
        "audio_airborne": jnp.asarray(
            rng.standard_normal((devices_per_proc, t, 1)).astype(np.float32) * 0.1
        ),
    }

    dp = DataParallel(task, build_mesh())
    state = dp.init_state(jax.random.key(0), local)
    for _ in range(2):
        state, logs = dp.train_step(state, local)
    loss = float(logs["train/generator/backprop_loss"])
    assert np.isfinite(loss), loss

    # sharded eval + host-side metrics: outputs must be gathered to every
    # process (the sync_dist analog) before numpy metrics can run
    outputs = dp.eval_step(state, local)
    metrics = task.eval_metrics(outputs)
    stoi = metrics.get("torchmetrics_stoi")
    assert stoi is None or np.isfinite(stoi)

    # --- multi-process tensor parallelism: data axis across processes,
    # model axis within each process (the TPU-pod convention: TP rides the
    # intra-host ICI).  Params must come out actually sharded over 'model'
    # and the step must run — the numerical-equivalence contract for TP is
    # pinned single-process in tests/test_multidevice_equivalence.py. ---
    from jax.sharding import PartitionSpec as P

    from vibravox_tpu.models.wav2vec2 import wav2vec2_for_ctc_from_config
    from vibravox_tpu.parallel.mesh import MeshConfig
    from vibravox_tpu.tasks.wav2vec2_stp import Wav2Vec2STPTask

    tp_task = Wav2Vec2STPTask(
        wav2vec2_for_ctc=wav2vec2_for_ctc_from_config(preset="tiny"),
        optimizer=optax.sgd(1e-3),
    )
    mesh_tp = build_mesh(MeshConfig(data=num_processes, model=devices_per_proc))
    dp_tp = DataParallel(tp_task, mesh_tp, donate_state=False)
    ids = np.full((2, 16), -100, np.int64)
    ids[:, :5] = rng.integers(0, 30, size=(2, 5))
    tp_local = {
        "audio": jnp.asarray(rng.standard_normal((2, 4096)).astype(np.float32)),
        "phonemes_ids": jnp.asarray(ids),
    }
    tp_state = dp_tp.init_state(jax.random.key(0), tp_local)
    spec = tp_state.params["layer_0"]["q_proj"]["kernel"].sharding.spec
    assert spec == P(None, "model"), f"TP params not sharded: {spec}"
    tp_state, tp_logs = dp_tp.train_step(tp_state, tp_local)
    tp_loss = float(tp_logs["train/ctc_loss"])
    assert np.isfinite(tp_loss), tp_loss

    # --- FSDP on a MULTI-PROCESS mesh (round-4 verdict #6): the per-host
    # state assembly (make_array_from_callback) must place each process's
    # addressable shards of a 'data'-sharded leaf correctly, not just the
    # 'model'-sharded ones TP exercises above.  Same task, same seed, same
    # global batch ⇒ the FSDP step's loss must match the TP-only step's
    # (pure resharding of identical math; f32 accumulation-order tolerance).
    dp_fsdp = DataParallel(
        tp_task, mesh_tp, donate_state=False, fsdp=True, fsdp_min_size=64
    )
    fsdp_state = dp_fsdp.init_state(jax.random.key(0), tp_local)
    fspec = fsdp_state.params["layer_0"]["q_proj"]["kernel"].sharding.spec
    assert fspec == P("data", "model"), f"FSDP+TP params not sharded: {fspec}"
    # adam/sgd-free check that moments would follow is pinned single-process
    # (tests/test_fsdp.py); here the contract is cross-process placement +
    # step execution + equivalence
    fsdp_state, fsdp_logs = dp_fsdp.train_step(fsdp_state, tp_local)
    fsdp_loss = float(fsdp_logs["train/ctc_loss"])
    assert np.isfinite(fsdp_loss), fsdp_loss
    assert abs(fsdp_loss - tp_loss) <= 1e-4 * max(1.0, abs(tp_loss)), (
        f"FSDP step diverges from TP-only step: {fsdp_loss} vs {tp_loss}"
    )

    print(
        f"MULTIHOST_OK process={process_id} loss={loss:.4f} "
        f"eval_metrics={sorted(metrics)} tp_ctc_loss={tp_loss:.4f} "
        f"fsdp_ctc_loss={fsdp_loss:.4f}",
        flush=True,
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nproc", type=int, default=2)
    ap.add_argument("--devices-per-proc", type=int, default=2)
    ap.add_argument("--worker", type=int, default=None, help=argparse.SUPPRESS)
    ap.add_argument("--port", type=int, default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.worker is not None:
        worker(args.worker, args.nproc, args.port, args.devices_per_proc)
        return 0

    port = _free_port()
    procs = [
        subprocess.Popen(
            [
                sys.executable, os.path.abspath(__file__),
                "--worker", str(i), "--nproc", str(args.nproc),
                "--port", str(port), "--devices-per-proc", str(args.devices_per_proc),
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(args.nproc)
    ]
    ok = True
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=2400)
        sys.stdout.write(out)
        if p.returncode != 0 or "MULTIHOST_OK" not in out:
            ok = False
            print(f"worker {i} FAILED (rc={p.returncode})")
    print("ALL OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
