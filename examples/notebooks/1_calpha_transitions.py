"""Step-by-step tool API walkthrough on a CA transition trajectory.

Port of the reference notebook
/root/reference/examples/notebooks/1.calpha_transitions/calpha_trajs.ipynb:
run each pipeline stage through the Python tool API — featurize, filter,
train several CV families, project, cluster — and inspect the artifacts,
instead of calling the one-shot `deep_carto` CLI.

Run: python 1_calpha_transitions.py    (writes ./output_calpha/)
"""

import os

from _common import banner, make_transition_system

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "output_calpha")

system = make_transition_system(os.path.join(OUT, "input"))

# ---------------------------------------------------------------------------
banner("Step 0: featurize the full GOdMD transition ensemble")
# The reference notebook walks all six calpha_transitions systems
# (data/calpha_transitions/input/); the generated data package ships the
# same six. Same-topology batching is per-system here (each system has its
# own chain length), so this is the serial-ensemble shape of the loop.
import importlib

from deep_cartograph_tpu.tools.compute_features import compute_features
from deep_cartograph_tpu.utils.demo_data import CALPHA_SYSTEMS

_data = importlib.import_module("deep_cartograph.data")
_calpha_inp = os.path.join(_data._ROOT, "calpha_transitions", "input")
ensemble_cfg = {
    "plumed_settings": {
        "traj_stride": 1,
        "features": {
            "distance_groups": {
                "dist": {
                    "first_selection": "name CA",
                    "second_selection": "name CA",
                    "first_stride": 1,
                    "second_stride": 2,
                    "skip_neigh_residues": True,
                }
            }
        },
    }
}
for _name, (_prefix, _, _) in CALPHA_SYSTEMS.items():
    _stem = _prefix or _name
    _paths = compute_features(
        configuration=ensemble_cfg,
        trajectory_data=[os.path.join(_calpha_inp, _name, _stem + ".dcd")],
        topology_data=[os.path.join(_calpha_inp, _name, _stem + ".pdb")],
        output_folder=os.path.join(OUT, "ensemble_features", _name),
    )
    print(f"{_name}: {_paths}")

# ---------------------------------------------------------------------------
banner("Step 1: compute features (torsions + distances)")
# The reference drives a PLUMED subprocess per trajectory; here the batched
# TPU featurization engine evaluates every frame chunk on device.
from deep_cartograph_tpu.tools.compute_features import compute_features

features_cfg = {
    "plumed_settings": {
        "traj_stride": 1,
        "features": {
            "distance_groups": {
                "ca_dist": {
                    "first_selection": "name CA",
                    "second_selection": "name CA",
                    "first_stride": 1,
                    "second_stride": 2,
                    "skip_neigh_residues": True,
                }
            },
            "dihedral_groups": {
                "backbone_tors": {
                    "selection": "name CA",
                    "periodic_encoding": True,
                    "search_mode": "virtual",
                }
            },
        },
    }
}
colvars_paths = compute_features(
    configuration=features_cfg,
    trajectory_data=[system.dcd_path],
    topology_data=[system.pdb_path],
    output_folder=os.path.join(OUT, "compute_features"),
)
print("colvars:", colvars_paths)

# ---------------------------------------------------------------------------
banner("Step 2: filter features")
# Keep features perturbed during the transition: entropy + std screens
# (the notebook also demonstrates the dip-test p-value cutoff).
from deep_cartograph_tpu.tools.filter_features import filter_features

filtered_path = filter_features(
    configuration={
        "filter_settings": {
            "std_quantile": 0.3,
            "diptest_significance_level": None,
        }
    },
    colvars_paths=colvars_paths,
    topologies=[system.pdb_path],
    output_folder=os.path.join(OUT, "filter_features"),
)
print("filtered feature list:", filtered_path)

# ---------------------------------------------------------------------------
banner("Step 3: train collective variables (PCA / AE / DeepTICA)")
# Geometric CVs (PCA, autoencoder) focus on variance/reconstruction;
# kinetic CVs (TICA family) on slow modes — same taxonomy as the notebook.
from deep_cartograph_tpu.tools.train_colvars import train_colvars
from deep_cartograph_tpu.utils.common import read_features_list

train_cfg = {
    "cvs": ["pca", "ae", "deep_tica"],
    "common": {
        "dimension": 2,
        "lag_time": 2,
        "features_normalization": "mean_std",
        "architecture": {"encoder": {"layers": [16, 16]}},
        "training": {
            "general": {"num_tries": 1, "max_epochs": 60, "batch_size": 32},
        },
    },
}
train_colvars(
    configuration=train_cfg,
    train_colvars_paths=colvars_paths,
    train_topologies=[system.pdb_path],
    trajectory_names=["calpha_example"],
    features_list=read_features_list(filtered_path),
    output_folder=os.path.join(OUT, "train_colvars"),
)
for cv in train_cfg["cvs"]:
    proj = os.path.join(
        OUT, "train_colvars", cv, "traj_data", "calpha_example",
        "projected_trajectory.csv",
    )
    print(cv, "projection ->", proj, os.path.exists(proj))

# ---------------------------------------------------------------------------
banner("Step 4: project onto a saved model")
from deep_cartograph_tpu.tools.traj_projection import traj_projection

model_zip = os.path.join(OUT, "train_colvars", "pca", "model.zip")
traj_projection(
    configuration={},
    colvars_paths=colvars_paths,
    topologies=[system.pdb_path],
    model_paths=[model_zip],
    output_folder=os.path.join(OUT, "traj_projection"),
)

# ---------------------------------------------------------------------------
banner("Step 5: cluster the CV space")
from deep_cartograph_tpu.tools.traj_cluster import traj_cluster

traj_cluster(
    configuration={
        "clustering": {
            "algorithm": "kmeans",
            "opt_num_clusters": True,
            "search_interval": [2, 4],
        }
    },
    cv_traj_paths=[
        os.path.join(
            OUT, "train_colvars", "pca", "traj_data", "calpha_example",
            "projected_trajectory.csv",
        )
    ],
    trajectories=[system.dcd_path],
    topologies=[system.pdb_path],
    output_folder=os.path.join(OUT, "traj_cluster"),
)
banner("Done — artifacts under " + OUT)
