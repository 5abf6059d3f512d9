#!/bin/bash
# VAE CV training through the deep_carto CLI — one run per feature config.
# Port of /root/reference/examples/miscellaneous/vae_training_examples/
# run_DeepCartograph_{distances,torsions,mix}.sl (SLURM scripts); the CLI
# flags are identical. On a cluster, wrap this in your scheduler's header
# (e.g. #SBATCH --gres=gpu:1 becomes a TPU-VM allocation for this framework).
#
# Usage: ./run_deep_cartograph.sh [distances|torsions|mix]
set -euo pipefail
cd "$(dirname "$0")"

VARIANT="${1:-mix}"

# Generate the demo inputs on first use
[ -d deepCarto_input ] || python generate_inputs.py

TRAJ_PATH=deepCarto_input/GOdMD_traj               # trajectories used for training
TOPOLOGY_PATH=deepCarto_input/GOdMD_top            # corresponding topology files
SUP_TRAJ_PATH=deepCarto_input/MDequilibration_traj # supplementary: projected only
SUP_TOP_PATH=deepCarto_input/MDequilibration_top   # their topology files
CONFIG_PATH="config_${VARIANT}.yml"

PYTHONPATH="$(cd ../../.. && pwd)${PYTHONPATH:+:$PYTHONPATH}" \
python -m deep_cartograph_tpu.cli \
           -conf "$CONFIG_PATH" \
           -top_data "$TOPOLOGY_PATH" \
           -traj_data "$TRAJ_PATH" \
           -sup_traj_data "$SUP_TRAJ_PATH" \
           -sup_top_data "$SUP_TOP_PATH" \
           -out "output_${VARIANT}" \
           -restart
