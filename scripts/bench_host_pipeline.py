"""Micro-benchmark: native C++ vs numpy host collate / resample.

The loader thread must outpace a ~100 ms train step; this prints how much
headroom each path has.  CPU-only — safe to run anywhere.

    python scripts/bench_host_pipeline.py [--batch 32] [--seconds 2.5]
"""

from __future__ import annotations

import argparse
import time

import numpy as np

from vibravox_tpu.data.collate import BWECollate
from vibravox_tpu.native import pipeline as native


def _time(fn, reps=20, warmup=3):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    return (time.perf_counter() - t0) / reps


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--seconds", type=float, default=2.5)
    ap.add_argument("--sample-rate", type=int, default=16000)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    sr = args.sample_rate
    # variable-length utterances around the crop target, like the dataset
    samples = [
        {
            "audio_body_conducted": rng.standard_normal(t).astype(np.float32),
            "audio_airborne": rng.standard_normal(t).astype(np.float32),
        }
        for t in rng.integers(int(2.0 * sr), int(6.0 * sr), size=args.batch)
    ]
    strategy = f"constant_length-{int(args.seconds * 1000)}-ms"

    def run(force_numpy: bool) -> float:
        collate = BWECollate(sample_rate=sr, strategy=strategy, seed=1)
        if force_numpy:
            orig = native.native_available
            native.native_available = lambda: False  # type: ignore[assignment]
            try:
                return _time(lambda: collate(samples))
            finally:
                native.native_available = orig  # type: ignore[assignment]
        return _time(lambda: collate(samples))

    t_np = run(force_numpy=True)
    print(f"collate numpy : {t_np * 1e3:8.3f} ms/batch (batch {args.batch})")
    if native.native_available():
        t_nat = run(force_numpy=False)
        print(f"collate native: {t_nat * 1e3:8.3f} ms/batch ({t_np / t_nat:.2f}x)")
    else:
        print("collate native: unavailable (no toolchain)")

    x = rng.standard_normal(48000 * 4).astype(np.float32)  # 4 s @ 48 kHz
    t_np = _time(lambda: native._resample_poly_numpy(x, 48000, 16000))
    print(f"resample 48k->16k numpy : {t_np * 1e3:8.3f} ms / 4 s audio")
    if native.native_available():
        t_nat = _time(lambda: native.resample_poly(x, 48000, 16000))
        print(f"resample 48k->16k native: {t_nat * 1e3:8.3f} ms ({t_np / t_nat:.2f}x)")


if __name__ == "__main__":
    main()
