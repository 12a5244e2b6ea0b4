"""Hardware smoke: one train/eval step of each non-EBEN task on the real TPU.

Catches backend-specific lowering issues (unsupported ops, dtype gaps) that
the CPU-mesh suite can't see. Prints one OK line per task.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_task_smoke.py
"""

from __future__ import annotations

import time


def main() -> None:
    from vibravox_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    # ---- STP: wav2vec2-CTC train step (tiny preset) ----
    from vibravox_tpu.models.wav2vec2 import TINY_W2V2_CONFIG, Wav2Vec2Config, Wav2Vec2ForCTC
    from vibravox_tpu.tasks.wav2vec2_stp import Wav2Vec2STPTask

    t0 = time.perf_counter()
    model = Wav2Vec2ForCTC(Wav2Vec2Config(**TINY_W2V2_CONFIG))
    task = Wav2Vec2STPTask(
        sample_rate=16000,
        wav2vec2_for_ctc=model,
        optimizer=optax.adamw(1e-4),
    )
    batch = {
        "audio": jnp.asarray(rng.standard_normal((2, 16000)).astype(np.float32) * 0.1),
        "phonemes_ids": jnp.asarray(
            np.where(np.arange(24)[None, :] < 20, rng.integers(0, 35, (2, 24)), -100)
        ),
    }
    state = jax.jit(task.init_state)(jax.random.key(0), batch)
    state, logs = jax.jit(task.train_step)(state, batch)
    loss = float(logs["train/ctc_loss"])
    assert np.isfinite(loss), loss
    print(f"STP_OK loss={loss:.3f} ({time.perf_counter()-t0:.0f}s)", flush=True)

    # ---- SPKV: ECAPA2 embedding forward ----
    from vibravox_tpu.models.ecapa2 import ECAPA2

    t0 = time.perf_counter()
    emb_model = ECAPA2()
    x = jnp.asarray(rng.standard_normal((2, 32000)).astype(np.float32) * 0.1)
    params = jax.jit(emb_model.init)(jax.random.key(0), x)
    emb = jax.jit(emb_model.apply)(params, x)
    assert emb.shape[-1] == 192 and bool(jnp.all(jnp.isfinite(emb)))
    print(f"SPKV_OK emb_shape={emb.shape} ({time.perf_counter()-t0:.0f}s)", flush=True)

    # ---- Mimi: encode/decode round trip (tiny shapes) ----
    from vibravox_tpu.models.mimi.mimi import Mimi

    t0 = time.perf_counter()
    mimi = Mimi(preset="tiny")
    audio = jnp.asarray(
        rng.standard_normal((1, mimi.frame_size * 4, 1)).astype(np.float32) * 0.1
    )
    codes = jax.jit(mimi.encode)(audio)
    out = jax.jit(mimi.decode)(codes)
    assert out.shape[1] == audio.shape[1] and bool(jnp.all(jnp.isfinite(out)))
    print(f"MIMI_OK codes={codes.shape} ({time.perf_counter()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
