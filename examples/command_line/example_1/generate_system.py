"""Generate the example system: a 16-residue CA chain with two-state motion."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

from tests.fixtures import make_ca_system

system = make_ca_system(os.path.dirname(os.path.abspath(__file__)) or ".",
                        n_residues=16, n_frames=200, seed=11)
os.replace(system.pdb_path, "system.pdb")
os.replace(system.dcd_path, "system.dcd")
print("wrote system.pdb and system.dcd")
