"""Generate SPKV trial-pair pickles.

Equivalent of the reference's ``scripts/gen_pairs_for_spkv.py`` (223 LoC):
builds seeded same/different-speaker trial lists (mixed- or same-gender)
from a dataset's test split and writes the pickle the SPKV datamodule
consumes (``spkv.py:226-239`` there; ``data/spkv.py`` here).

Usage:
    python -m vibravox_tpu.scripts.gen_pairs_for_spkv \
        --dataset synthetic --n-pairs 96 --gender-policy mixed_gender \
        --output pairs.pkl
"""

from __future__ import annotations

import argparse
import pickle


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dataset", default="Cnam-LMSSC/vibravox")
    parser.add_argument("--subset", default="speech_clean")
    parser.add_argument("--sensor", default="headset_microphone")
    parser.add_argument("--n-pairs", type=int, default=98532)
    parser.add_argument("--gender-policy", default="mixed_gender",
                        choices=["mixed_gender", "same_gender"])
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--output", required=True)
    args = parser.parse_args(argv)

    from vibravox_tpu.data.spkv import SPKVDataModule, generate_trial_pairs

    dm = SPKVDataModule(
        dataset_name=args.dataset, subset=args.subset,
        sensor_a=args.sensor, sensor_b=args.sensor, seed=args.seed,
    )
    src = dm._load_split("test", args.sensor)
    order = sorted(range(len(src)), key=lambda i: str(src[i]["speaker_id"]))
    rows = [src[i] for i in order]
    pairs = generate_trial_pairs(
        [str(r["speaker_id"]) for r in rows],
        [str(r["gender"]) for r in rows],
        args.n_pairs, args.gender_policy, seed=args.seed,
    )
    with open(args.output, "wb") as f:
        pickle.dump(pairs, f)
    print(f"wrote {len(pairs)} pairs to {args.output}")


if __name__ == "__main__":
    main()
