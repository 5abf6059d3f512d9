"""Trajectory augmentation: densify a sparse seed path into training data.

Port of /root/reference/examples/notebooks/6.traj_augmentation/
traj_augmentation.ipynb: a short "transition path" of waypoint frames is
interpolated (pchip) up to many frames, Gaussian noise makes replicas
diverse, and the augmented ensemble feeds CV training.

Run: python 6_traj_augmentation.py    (writes ./output_augmentation/)
"""

import os

from _common import banner, make_transition_system

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "output_augmentation")

# A sparse seed: only 12 frames along the transition
system = make_transition_system(os.path.join(OUT, "input"), n_frames=12)

banner("Augment: pchip-interpolate 12 -> 300 frames, 2 noisy replicas")
from deep_cartograph_tpu.tools.traj_augmentation import traj_augmentation

aug_trajs, aug_tops = traj_augmentation(
    configuration={
        "num_frames": 300,
        "interpolation_method": "pchip",
        "noise_std": 0.05,
        "traj_format": "dcd",
    },
    trajectory_data=[system.dcd_path],
    topology_data=[system.pdb_path],
    num_replicas=2,
    output_folder=os.path.join(OUT, "traj_augmentation"),
)
print("augmented trajectories:", aug_trajs)

banner("Featurize the augmented ensemble")
from deep_cartograph_tpu.tools.compute_features import compute_features

colvars = compute_features(
    configuration={
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
                    }
                }
            },
        }
    },
    trajectory_data=aug_trajs,
    topology_data=system.pdb_path,
    output_folder=os.path.join(OUT, "compute_features"),
)

banner("Train a TICA CV on the augmented data")
from deep_cartograph_tpu.tools.train_colvars import train_colvars

train_colvars(
    configuration={"cvs": ["tica"], "common": {"dimension": 2, "lag_time": 5}},
    train_colvars_paths=colvars,
    train_topologies=[system.pdb_path] * len(colvars),
    output_folder=os.path.join(OUT, "train_colvars"),
)
banner("Done — artifacts under " + OUT)
