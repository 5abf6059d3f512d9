"""Example 3: multi-trajectory ensemble with supplementary projection.

Mirrors the reference's peptide-ensemble workflow (examples/notebooks/2):
two independent trajectories of the same CA system train a shared TICA CV;
a third (supplementary) trajectory is projected onto the trained CV and
assigned to clusters by 1-NN — the cross-trajectory analysis loop.

Run:  python run_ensemble.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

import numpy as np

from tests.fixtures import make_ca_coords, write_ca_pdb
from deep_cartograph_tpu.io.traj import write_traj
from deep_cartograph_tpu.io.topology import Topology
from deep_cartograph_tpu.tools.compute_features import compute_features
from deep_cartograph_tpu.tools.train_colvars import train_colvars
from deep_cartograph_tpu.tools.traj_projection import traj_projection
from deep_cartograph_tpu.tools.traj_cluster import traj_cluster


def main() -> None:
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results")
    os.makedirs(out, exist_ok=True)

    # Three trajectories of one 14-residue CA system (different seeds)
    n_res = 14
    pdb = os.path.join(out, "system.pdb")
    write_ca_pdb(pdb, make_ca_coords(n_res, 1, seed=0)[0])
    top = Topology.from_file(pdb)
    trajs = []
    for i, seed in enumerate((1, 2, 3)):
        coords = make_ca_coords(n_res, 150, seed=seed)
        path = os.path.join(out, f"traj_{i}.dcd")
        write_traj(path, coords, top)
        trajs.append(path)

    feat_cfg = {
        "plumed_settings": {
            "traj_stride": 1,
            "features": {
                "distance_groups": {
                    "ca": {
                        "first_selection": "name CA",
                        "second_selection": "name CA",
                        "first_stride": 1,
                        "second_stride": 2,
                        "skip_neigh_residues": True,
                        "skip_bonded_atoms": False,
                    }
                }
            },
        }
    }
    colvars = compute_features(
        configuration=feat_cfg,
        trajectory_data=trajs,
        topology_data=pdb,
        output_folder=os.path.join(out, "compute_features"),
    )

    # Train on the first two trajectories
    train_cfg = {
        "cvs": ["tica"],
        "common": {"dimension": 2, "lag_time": 2,
                   "features_normalization": "mean_std"},
    }
    train_out = os.path.join(out, "train_colvars")
    outputs = train_colvars(
        configuration=train_cfg,
        train_colvars_paths=colvars[:2],
        train_topologies=[pdb, pdb],
        trajectory_names=["traj_0", "traj_1"],
        output_folder=train_out,
    )
    print("trained:", sorted(outputs))

    # Project the supplementary third trajectory onto the saved model
    proj_out = os.path.join(out, "traj_projection")
    traj_projection(
        configuration={},
        colvars_paths=colvars[2:],
        topologies=[pdb],
        model_paths=[os.path.join(train_out, "tica", "model.zip")],
        trajectory_names=["traj_2"],
        output_folder=proj_out,
    )

    # Cluster the training projection; assign the supplementary data by 1-NN
    traj_cluster(
        configuration={"algorithm": "kmeans", "num_clusters": 3,
                       "opt_num_clusters": False, "output_structures": None},
        cv_traj_paths=[os.path.join(
            train_out, "tica", "traj_data", "traj_0",
            "projected_trajectory.csv",
        )],
        sup_cv_traj_paths=[os.path.join(
            proj_out, "tica", "traj_2", "projected_trajectory.csv",
        )],
        output_folder=os.path.join(out, "traj_cluster"),
    )
    print("Results in", out)


if __name__ == "__main__":
    main()
