#!/bin/bash
# Run the biased MD with GROMACS+PLUMED using the inputs produced by
# make_biased_inputs.py. Port of the reference's run_md.sl (SLURM script,
# /root/reference/examples/miscellaneous/gromacs_biased_simulations/run_md.sl)
# — same grompp/mdrun invocation; add your scheduler's header for a cluster.
#
# Requires GROMACS patched with PLUMED (not part of this framework):
#   ml GROMACS/2023.3-...-PLUMED-2.9.0   # or your site's equivalent
set -euo pipefail
cd "$(dirname "$0")"

export OMP_NUM_THREADS="${OMP_NUM_THREADS:-8}"

# Inputs: your equilibrated system (coordinates/checkpoint/topology/index)
EQUIL_FOLDER=${EQUIL_FOLDER:?set EQUIL_FOLDER to your equilibration output}
COORDINATES=$EQUIL_FOLDER/npt.gro
CHECKPOINT=$EQUIL_FOLDER/npt.cpt
TOPOLOGY=$EQUIL_FOLDER/topology.top
INDEX_FILE=$EQUIL_FOLDER/index.ndx

# The PLUMED input exported by make_biased_inputs.py
PLUMED_INPUT=output/deploy/plumed_input_vae_opes_metad_explore.dat

gmx grompp -f md.mdp -c "$COORDINATES" -r "$COORDINATES" -p "$TOPOLOGY" \
           -t "$CHECKPOINT" -n "$INDEX_FILE" -o md.tpr
gmx mdrun -plumed "$PLUMED_INPUT" -deffnm md -ntmpi 1 \
          -ntomp "$OMP_NUM_THREADS"
