"""Generate SPKV trial-pair pickles with the reference's exact construction.

Equivalent of the reference's ``scripts/gen_pairs_for_spkv.py`` (223 LoC):
per speaker, ALL same-speaker utterance combinations (truncated to the
dataset-wide minimum utterance count) plus a structurally matched count of
random different-speaker pairs; a mixed-gender and a same-gender list are
drawn from ONE seeded Mersenne-Twister stream (mixed first), mirroring the
reference's ``seed_everything(42)`` + sequential generation — so with
identical speaker statistics the pickles are bit-identical to a reference
run.  The SPKV datamodule consumes the pickle via ``pairs_file``
(``lightning_datamodules/spkv.py:226-239`` there; ``data/spkv.py`` here).

Usage:
    python -m vibravox_tpu.scripts.gen_pairs_for_spkv \
        --dataset synthetic --output-dir pairs/
writes ``mixed_gender.pkl`` and ``same_gender.pkl`` under ``--output-dir``.
"""

from __future__ import annotations

import argparse
import pickle
import random
from pathlib import Path


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dataset", default="Cnam-LMSSC/vibravox_enhanced_by_EBEN")
    parser.add_argument("--subset", default="speech_clean")
    parser.add_argument("--sensor", default="headset_microphone")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--output-dir", required=True)
    args = parser.parse_args(argv)

    from vibravox_tpu.data.spkv import (
        SPKVDataModule,
        generate_trial_pairs,
        speaker_sort_order,
    )

    dm = SPKVDataModule(
        dataset_name=args.dataset, subset=args.subset,
        sensor_a=args.sensor, sensor_b=args.sensor, seed=args.seed,
    )
    src = dm._load_split("test", args.sensor)
    # native column dtype, like the reference's dataset.sort("speaker_id")
    order = speaker_sort_order(src)
    rows = [src[i] for i in order]
    speakers = [str(r["speaker_id"]) for r in rows]
    genders = [str(r["gender"]) for r in rows]

    # one stream, mixed first — the reference generates both lists under a
    # single seed_everything(42) in this order
    rng = random.Random(args.seed)
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    for policy in ("mixed_gender", "same_gender"):
        pairs = generate_trial_pairs(speakers, genders, policy, rng=rng)
        path = out / f"{policy}.pkl"
        with open(path, "wb") as f:
            pickle.dump(pairs, f)
        print(f"wrote {len(pairs)} pairs to {path}")


if __name__ == "__main__":
    main()
