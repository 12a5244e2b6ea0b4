"""Export/push a trained EBEN discriminator (ref ``scripts/push_dis_to_hub.py``).

Usage:
    python -m vibravox_tpu.scripts.push_dis_to_hub \
        --checkpoint .../checkpoints/last --out disc_export/ [--repo-id ...]
"""

from __future__ import annotations

import argparse
import os


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--repo-id", default=None)
    args = parser.parse_args(argv)

    import orbax.checkpoint as ocp

    state = ocp.StandardCheckpointer().restore(os.path.abspath(args.checkpoint))
    disc_params = state["disc_params"] if "disc_params" in state else state
    # export as orbax (native) — the reference's torch-layout export for the
    # discriminator follows the generator converter's structure
    os.makedirs(args.out, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(os.path.join(args.out, "discriminator")), disc_params)
    ckptr.wait_until_finished()  # orbax saves are async; commit before exit
    print(f"exported discriminator params to {args.out}/discriminator")
    if args.repo_id:
        from huggingface_hub import HfApi

        HfApi().upload_folder(repo_id=args.repo_id, folder_path=args.out,
                              commit_message="Upload EBEN discriminator")
        print(f"pushed to {args.repo_id}")


if __name__ == "__main__":
    main()
