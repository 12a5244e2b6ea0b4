"""Export a trained EBEN generator checkpoint to the hub weight format.

Equivalent of the reference's ``scripts/upload_eben_to_hub.py``: loads an
orbax training checkpoint, strips it to the generator params, re-infers
(m, n, p) from shapes, writes hub-layout torch-format files and optionally
pushes.

Usage:
    python -m vibravox_tpu.scripts.upload_eben_to_hub \
        --checkpoint outputs/run/.../checkpoints/last --out eben_export/ \
        [--repo-id Cnam-LMSSC/EBEN_my_sensor]
"""

from __future__ import annotations

import argparse


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint", required=True, help="orbax checkpoint dir (e.g. .../last)")
    parser.add_argument("--out", required=True, help="export directory")
    parser.add_argument("--repo-id", default=None, help="push to this hub repo when set")
    args = parser.parse_args(argv)

    import orbax.checkpoint as ocp

    from vibravox_tpu.models.hub import push_eben_generator_to_hub, save_eben_generator

    import os

    state = ocp.StandardCheckpointer().restore(os.path.abspath(args.checkpoint))
    gen_params = state["gen_params"] if "gen_params" in state else state
    # infer m/n/p from shapes like the reference (upload_eben_to_hub.py:17-20)
    p_tree = gen_params["params"]
    m = p_tree["last_conv"]["kernel"].shape[-1]
    p = p_tree["first_conv"]["kernel"].shape[1]
    # n isn't in the trainable params (PQMF is designed); default reference value
    n = 32
    path = save_eben_generator(gen_params, args.out, m=int(m), n=n, p=int(p))
    print(f"exported EBEN(m={m}, n={n}, p={p}) to {path}")
    if args.repo_id:
        push_eben_generator_to_hub(gen_params, args.repo_id, m=int(m), n=n, p=int(p))
        print(f"pushed to {args.repo_id}")


if __name__ == "__main__":
    main()
