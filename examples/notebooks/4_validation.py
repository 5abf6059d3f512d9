"""Validation-data workflow: train on one trajectory, validate on another.

Port of /root/reference/examples/notebooks/4.validation/validation.ipynb:
deep CVs are trained with an EXPLICIT validation trajectory (instead of a
random split), then both datasets are projected onto the learned CV to
check that the validation ensemble maps into the same landscape.

Run: python 4_validation.py    (writes ./output_validation/)
"""

import os

import pandas as pd

from _common import banner, make_transition_system

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "output_validation")

train_sys = make_transition_system(os.path.join(OUT, "input_train"), seed=11)
valid_sys = make_transition_system(os.path.join(OUT, "input_valid"), seed=23)

banner("Featurize train + validation trajectories")
# The data package ships the reference's validation-workflow configs
# (calpha_transitions/input/distances_config_validation.yml); drive the
# featurization from it, exactly like the reference notebook.
import importlib

from deep_cartograph_tpu.tools.compute_features import compute_features
from deep_cartograph_tpu.utils.common import read_configuration

_data = importlib.import_module("deep_cartograph.data")
_val_cfg = read_configuration(
    os.path.join(
        _data._ROOT, "calpha_transitions", "input",
        "distances_config_validation.yml",
    )
)
features_cfg = _val_cfg["compute_features"]
train_colvars_paths = compute_features(
    configuration=features_cfg,
    trajectory_data=[train_sys.dcd_path],
    topology_data=[train_sys.pdb_path],
    output_folder=os.path.join(OUT, "features_train"),
)
valid_colvars_paths = compute_features(
    configuration=features_cfg,
    trajectory_data=[valid_sys.dcd_path],
    topology_data=[valid_sys.pdb_path],
    output_folder=os.path.join(OUT, "features_valid"),
)

banner("Train DeepTICA with the explicit validation set")
from deep_cartograph_tpu.tools.train_colvars import train_colvars

train_colvars(
    configuration={
        "cvs": ["deep_tica"],
        "common": {
            "dimension": 2,
            "lag_time": 2,
            "features_normalization": "mean_std",
            "architecture": {"encoder": {"layers": [16, 16]}},
            "training": {
                "general": {"num_tries": 1, "max_epochs": 60, "batch_size": 32}
            },
        },
    },
    train_colvars_paths=train_colvars_paths,
    train_topologies=[train_sys.pdb_path],
    val_colvars_paths=valid_colvars_paths,
    val_topologies=[valid_sys.pdb_path],
    trajectory_names=["train_traj"],
    output_folder=os.path.join(OUT, "train_colvars"),
)

banner("Project the validation trajectory onto the trained CV")
from deep_cartograph_tpu.tools.traj_projection import traj_projection

model_zip = os.path.join(OUT, "train_colvars", "deep_tica", "model.zip")
traj_projection(
    configuration={},
    colvars_paths=valid_colvars_paths,
    topologies=[valid_sys.pdb_path],
    model_paths=[model_zip],
    output_folder=os.path.join(OUT, "traj_projection"),
)

for root, _, files in os.walk(os.path.join(OUT, "traj_projection")):
    for f in files:
        if f.endswith(".csv"):
            df = pd.read_csv(os.path.join(root, f))
            print(f, "->", df.shape, "CV range:",
                  df.iloc[:, 0].min(), "..", df.iloc[:, 0].max())
banner("Done — artifacts under " + OUT)
