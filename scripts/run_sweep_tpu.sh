#!/bin/bash
# TPU-pod sweep launcher — the equivalent of the reference's SLURM array
# scripts (scripts/run_*_slurm_array_JZ.sh). Under SLURM, submit with
#   sbatch --array=0-N scripts/run_sweep_tpu.sh configs/sweeps/bwe.txt
# locally it runs every line sequentially.
#SBATCH --job-name=vibravox-tpu-sweep
#SBATCH --time=99:00:00
set -euo pipefail
export HF_HUB_OFFLINE=${HF_HUB_OFFLINE:-1}
export HF_DATASETS_OFFLINE=${HF_DATASETS_OFFLINE:-1}
TABLE=${1:?usage: run_sweep_tpu.sh <sweep-table>}
python -m vibravox_tpu.scripts.sweep "$TABLE"
