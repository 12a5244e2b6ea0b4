"""Sweep runner: one run.py invocation per line of a sweep table.

TPU-native equivalent of the reference's SLURM array launchers
(``scripts/run_*_slurm_array_JZ.sh`` + ``configs/slurm_array/*.txt``): each
table line holds the CLI overrides of one job; locally they run
sequentially, under SLURM the array task id picks its line.

Usage:
    python -m vibravox_tpu.scripts.sweep configs/sweeps/bwe.txt [--line N]
"""

from __future__ import annotations

import argparse
import os
import shlex
import subprocess
import sys
from pathlib import Path


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("table", help="sweep table: one overrides-line per job")
    parser.add_argument("--line", type=int, default=None,
                        help="run only this line (defaults to SLURM_ARRAY_TASK_ID or all)")
    parser.add_argument("--dry-run", action="store_true")
    args = parser.parse_args(argv)

    lines = [
        ln.strip() for ln in Path(args.table).read_text().splitlines()
        if ln.strip() and not ln.strip().startswith("#")
    ]
    line = args.line
    if line is None and "SLURM_ARRAY_TASK_ID" in os.environ:
        line = int(os.environ["SLURM_ARRAY_TASK_ID"])
    selected = [lines[line]] if line is not None else lines

    run_py = Path(__file__).resolve().parents[2] / "run.py"
    for overrides in selected:
        cmd = [sys.executable, str(run_py)] + shlex.split(overrides)
        print("+", " ".join(cmd), flush=True)
        if not args.dry_run:
            subprocess.run(cmd, check=True)


if __name__ == "__main__":
    main()
