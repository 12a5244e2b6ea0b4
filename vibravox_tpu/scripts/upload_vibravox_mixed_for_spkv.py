"""Build the noise-mixed SPKV test dataset (all sensors share one noise slice).

Equivalent of ``scripts/upload_vibravox_mixed_for_spkv.py``: for each test
utterance, draws ONE noise slice and mixes it into every sensor's channel,
writing npz utterances (and optionally pushing a dataset).

Usage:
    python -m vibravox_tpu.scripts.upload_vibravox_mixed_for_spkv \
        --dataset synthetic --out mixed_spkv/
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dataset", default="Cnam-LMSSC/vibravox")
    parser.add_argument("--sensors", nargs="+", default=["headset_microphone"])
    parser.add_argument("--out", required=True)
    parser.add_argument("--sample-rate", type=int, default=16000)
    parser.add_argument("--seed", type=int, default=42)
    args = parser.parse_args(argv)

    from vibravox_tpu.data.noisybwe import NoisyBWEDataModule

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    dm = NoisyBWEDataModule(dataset_name=args.dataset, sample_rate=args.sample_rate)
    noise_src = dm._noise_source("test")
    speech_srcs = {s: None for s in args.sensors}
    for sensor in args.sensors:
        dm_s = NoisyBWEDataModule(dataset_name=args.dataset, sensor=sensor,
                                  sample_rate=args.sample_rate)
        speech_srcs[sensor] = dm_s._speech_source("test")

    n = len(next(iter(speech_srcs.values())))
    for i in range(n):
        noise = np.asarray(
            noise_src[int(rng.integers(len(noise_src)))]["audio_body_conducted_speechless_noisy"],
            np.float32,
        )
        item = {}
        for sensor, src in speech_srcs.items():
            speech = np.asarray(src[i]["audio_body_conducted"], np.float32)
            nz = noise
            if len(nz) < len(speech):
                nz = np.tile(nz, int(np.ceil(len(speech) / len(nz))))
            start = int(rng.integers(0, len(nz) - len(speech) + 1))
            item[f"audio_mixed.{sensor}"] = speech + nz[start : start + len(speech)]
        np.savez(out / f"{i:06d}.npz", **item)
    print(f"wrote {n} mixed utterances to {out}")


if __name__ == "__main__":
    main()
