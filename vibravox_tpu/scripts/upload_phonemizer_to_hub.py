"""Export a fine-tuned phonemizer to the HF torch Wav2Vec2ForCTC format.

Equivalent of ``scripts/upload_phonemizer_to_hub.py``: strips the training
checkpoint to the model weights, converts to the torch state dict, writes
hub-layout files (+ tokenizer/feature-extractor configs) and optionally
pushes.

Usage:
    python -m vibravox_tpu.scripts.upload_phonemizer_to_hub \
        --checkpoint .../checkpoints/last --out phonemizer_export/ [--repo-id ...]
"""

from __future__ import annotations

import argparse
import os


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--repo-id", default=None)
    parser.add_argument("--preset", default=None, help="model preset used in training (e.g. tiny)")
    args = parser.parse_args(argv)

    import orbax.checkpoint as ocp

    from vibravox_tpu.data.phonemes import build_phoneme_tokenizer
    from vibravox_tpu.models.convert import save_torch_state_dict
    from vibravox_tpu.models.wav2vec2 import (
        Wav2Vec2Config,
        TINY_W2V2_CONFIG,
        wav2vec2_params_to_torch,
    )

    state = ocp.StandardCheckpointer().restore(os.path.abspath(args.checkpoint))
    params = state["params"] if "params" in state else state
    config = Wav2Vec2Config(**(TINY_W2V2_CONFIG if args.preset == "tiny" else {}))
    sd = wav2vec2_params_to_torch(params, config)
    os.makedirs(args.out, exist_ok=True)
    try:
        save_torch_state_dict(sd, os.path.join(args.out, "model.safetensors"))
    except ImportError:
        save_torch_state_dict(sd, os.path.join(args.out, "pytorch_model.bin"))
    tokenizer = build_phoneme_tokenizer()
    tokenizer.save_pretrained(args.out)
    print(f"exported phonemizer + tokenizer to {args.out}")
    if args.repo_id:
        from huggingface_hub import HfApi

        HfApi().upload_folder(repo_id=args.repo_id, folder_path=args.out,
                              commit_message="Upload phonemizer after training")
        print(f"pushed to {args.repo_id}")


if __name__ == "__main__":
    main()
