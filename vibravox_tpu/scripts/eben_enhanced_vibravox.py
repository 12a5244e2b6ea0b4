"""Batch-enhance a dataset's test split with pretrained EBEN generators.

Equivalent of the reference's ``scripts/eben_enhanced_vibravox.py``: runs
one pretrained EBEN per body-conduction sensor over the test split and
writes the enhanced audio (npz per utterance; optionally pushes a dataset).

Usage:
    python -m vibravox_tpu.scripts.eben_enhanced_vibravox \
        --dataset synthetic --sensors rigid_in_ear_microphone \
        --weights path/to/eben_weights --out enhanced/
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dataset", default="Cnam-LMSSC/vibravox")
    parser.add_argument("--subset", default="speech_clean")
    parser.add_argument("--sensors", nargs="+", default=["rigid_in_ear_microphone"])
    parser.add_argument("--weights", nargs="+", required=True,
                        help="one hub repo / weight path per sensor")
    parser.add_argument("--out", required=True)
    parser.add_argument("--sample-rate", type=int, default=16000)
    parser.add_argument("--limit", type=int, default=None,
                        help="enhance only the first N utterances (smoke runs)")
    args = parser.parse_args(argv)
    assert len(args.sensors) == len(args.weights)

    import jax
    import jax.numpy as jnp

    from vibravox_tpu.data.bwe import _resolve_source
    from vibravox_tpu.models.hub import eben_generator_from_pretrained

    out_root = Path(args.out)
    for sensor, weights in zip(args.sensors, args.weights):
        model, params = eben_generator_from_pretrained(weights)
        enhance = jax.jit(lambda p, a: model.apply(p, a)[0])
        source = _resolve_source(
            args.dataset, args.subset, "test", sensor, args.sample_rate, False
        )
        out_dir = out_root / sensor
        out_dir.mkdir(parents=True, exist_ok=True)
        count = 0
        for i, row in enumerate(source):
            if args.limit is not None and i >= args.limit:
                break
            audio = jnp.asarray(
                np.asarray(row["audio_body_conducted"], np.float32)
            )[None, :, None]
            audio = model.cut_to_valid_length(audio)
            enhanced = np.asarray(enhance(params, audio))[0, :, 0]
            np.savez(out_dir / f"{i:06d}.npz", audio_enhanced=enhanced)
            count += 1
        print(f"{sensor}: enhanced {count} utterances -> {out_dir}")


if __name__ == "__main__":
    main()
