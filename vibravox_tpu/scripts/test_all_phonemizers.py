"""Cross-sensor phonemizer PER matrix.

Equivalent of the reference's ``scripts/test_all_phonemizers.py``: evaluate
every pretrained phonemizer (one per training sensor) against every test
sensor — a 6×6 PER matrix with Levenshtein edit-op confusion accounting.

Usage:
    python -m vibravox_tpu.scripts.test_all_phonemizers \
        --dataset synthetic --phonemizers tiny --sensors headset_microphone \
        --out outputs/phonemizer_matrix
"""

from __future__ import annotations

import argparse
import json
from collections import Counter
from pathlib import Path

import numpy as np

from vibravox_tpu.data.sources import SENSORS


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dataset", default="Cnam-LMSSC/vibravox")
    parser.add_argument("--subset", default="speech_clean")
    parser.add_argument("--sensors", nargs="+", default=list(SENSORS))
    parser.add_argument(
        "--phonemizers", nargs="+", required=True,
        help="hub repos / local paths of Wav2Vec2-CTC phonemizers, or 'tiny' for a random model",
    )
    parser.add_argument("--out", required=True)
    parser.add_argument("--limit", type=int, default=None)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from vibravox_tpu.data.phonemes import build_phoneme_tokenizer
    from vibravox_tpu.data.stp import STPDataModule
    from vibravox_tpu.metrics.text import (
        char_error_rate,
        decode_operations,
        levenshtein_editops,
        split_editops,
    )
    from vibravox_tpu.models.wav2vec2 import (
        wav2vec2_for_ctc_from_config,
        wav2vec2_for_ctc_from_pretrained,
    )

    tokenizer = build_phoneme_tokenizer()
    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    per_matrix = {}
    confusions: Counter = Counter()

    for phonemizer_name in args.phonemizers:
        model = (
            wav2vec2_for_ctc_from_config(preset="tiny")
            if phonemizer_name == "tiny"
            else wav2vec2_for_ctc_from_pretrained(phonemizer_name)
        )
        forward = jax.jit(lambda p, a: jnp.argmax(model(a, params=p).logits, axis=-1))
        for sensor in args.sensors:
            dm = STPDataModule(
                dataset_name_principal=args.dataset, subset=args.subset,
                sensor=sensor, batch_size=1, tokenizer=tokenizer,
            )
            dm.setup("test")
            preds, targets = [], []
            for i, batch in enumerate(dm.test_dataloader()):
                if args.limit is not None and i >= args.limit:
                    break
                ids = forward(model.params, jnp.asarray(batch["audio"]))
                decoded = tokenizer.batch_decode(np.asarray(ids))
                preds.extend(decoded)
                targets.extend(batch["phonemes_str"])
            per = char_error_rate(preds, targets)
            per_matrix[f"{phonemizer_name}::{sensor}"] = per
            for pred, tgt in zip(preds, targets):
                ops = levenshtein_editops(pred, tgt)
                _, in_word, _ = split_editops(pred, tgt, ops)
                for op, a, b in decode_operations(pred, tgt, in_word):
                    confusions[(op, a, b)] += 1
            print(f"{phonemizer_name} on {sensor}: PER={per:.4f}")

    (out_dir / "per_matrix.json").write_text(json.dumps(per_matrix, indent=1))
    (out_dir / "confusions.json").write_text(
        json.dumps({f"{op}:{a}->{b}": c for (op, a, b), c in confusions.most_common(200)},
                   ensure_ascii=False, indent=1)
    )
    print(f"wrote {out_dir}/per_matrix.json")


if __name__ == "__main__":
    main()
