"""Feature-family experiments: distances vs torsions vs mixed.

Port of /root/reference/examples/notebooks/3.aladip_experiments/
aladip_experiments.ipynb (and the miscellaneous/vae_training_examples
config triplet): the same trajectory is featurized three ways and a CV is
trained on each, to compare how the feature family shapes the landscape.

Run: python 3_feature_experiments.py    (writes ./output_experiments/)
"""

import os

import pandas as pd

from _common import banner, make_transition_system

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "output_experiments")

system = make_transition_system(os.path.join(OUT, "input"))

DISTANCES = {
    "distance_groups": {
        "ca": {
            "first_selection": "name CA",
            "second_selection": "name CA",
            "first_stride": 1,
            "second_stride": 2,
            "skip_neigh_residues": True,
        }
    }
}
TORSIONS = {
    "dihedral_groups": {
        "virt": {
            "selection": "name CA",
            "periodic_encoding": True,
            "search_mode": "virtual",
        }
    }
}
EXPERIMENTS = {
    "distances": DISTANCES,
    "torsions": TORSIONS,
    "mix": {**DISTANCES, **TORSIONS},
}

from deep_cartograph_tpu.tools.compute_features import compute_features
from deep_cartograph_tpu.tools.train_colvars import train_colvars

for name, features in EXPERIMENTS.items():
    banner(f"Experiment: {name}")
    colvars = compute_features(
        configuration={"plumed_settings": {"traj_stride": 1,
                                           "features": features}},
        trajectory_data=[system.dcd_path],
        topology_data=[system.pdb_path],
        output_folder=os.path.join(OUT, name, "compute_features"),
    )
    train_colvars(
        configuration={
            "cvs": ["pca", "tica"],
            "common": {"dimension": 2, "lag_time": 2},
        },
        train_colvars_paths=colvars,
        train_topologies=[system.pdb_path],
        trajectory_names=["traj"],
        output_folder=os.path.join(OUT, name, "train_colvars"),
    )
    proj = pd.read_csv(
        os.path.join(OUT, name, "train_colvars", "tica", "traj_data", "traj",
                     "projected_trajectory.csv")
    )
    print(f"{name}: {proj.shape[1] - 0} CV columns, "
          f"tica1 span {proj.iloc[:, 0].max() - proj.iloc[:, 0].min():.3f}")
banner("Done — artifacts under " + OUT)
