from deep_cartograph_tpu.io.topology import Topology, create_pdb, parse_pdb, write_pdb
from deep_cartograph_tpu.io.selection import evaluate_selection
from deep_cartograph_tpu.io import colvars, traj
