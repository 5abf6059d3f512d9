"""Peptide-ensemble screening: map several peptides with several feature sets.

Port of /root/reference/examples/notebooks/2.peptide_ensemble/peptide.ipynb:
the conformational-selection question — for each peptide of an ensemble, run
the full workflow with TORSIONS, DISTANCES, and ALL features, passing the
"active conformation" reference ensemble as supplementary data so it is
projected onto the learned CV next to the solution ensemble. If the peptide
visits its bioactive conformation in solution, the supplementary frames land
inside a populated basin of the solution FES.

Inputs come from the drop-in `deep_cartograph.data` package exactly like
the reference notebook (resources.files(data) / peptide_ensemble / input /
peptideN) — the datasets are generated bimodal-torsion peptides with the
second metastable state as each peptide's "active conformation".

Run: python 2_peptide_ensemble.py    (writes ./output_peptide_ensemble/)
"""

import importlib.resources as resources
import os
import shutil

import numpy as np
import pandas as pd

from _common import banner  # noqa: F401  (sys.path setup)
from deep_cartograph import data

data_folder = str(resources.files(data))

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "output_peptide_ensemble")

FEATURE_SETS = {
    "torsions": {
        "dihedral_groups": {
            "tor": {
                "selection": "not name H* and backbone and not name O",
                "periodic_encoding": True,
                "search_mode": "real",
            }
        }
    },
    "distances": {
        "distance_groups": {
            "dist": {
                "first_selection": "name CA",
                "second_selection": "name CA",
                "first_stride": 1,
                "second_stride": 1,
                "skip_neigh_residues": True,
                "skip_bonded_atoms": False,
            }
        }
    },
}
FEATURE_SETS["all"] = {**FEATURE_SETS["torsions"], **FEATURE_SETS["distances"]}

CVS = ["pca", "ae"]


def run_deep_cartograph(system_name: str, features: str) -> None:
    from deep_cartograph_tpu.pipeline import deep_cartograph

    output_folder = os.path.join(OUT, system_name, features)
    if os.path.exists(output_folder):
        shutil.rmtree(output_folder)

    # Input trajectory, topology, and active-conformation reference — the
    # reference notebook's exact path scheme into the data package.
    input_path = os.path.join(data_folder, "peptide_ensemble", "input",
                              system_name)
    traj_path = os.path.join(input_path, f"{system_name}.xtc")
    top_path = os.path.join(input_path, f"{system_name}.pdb")
    active = os.path.join(input_path, "active_conformation")
    active_traj = os.path.join(active, "active_conformation.xtc")
    active_pdb = os.path.join(active, "active_conformation.pdb")

    configuration = {
        "compute_features": {
            "plumed_settings": {
                "traj_stride": 1,
                "features": FEATURE_SETS[features],
            }
        },
        "filter_features": {
            "filter_settings": {"compute_diptest": False,
                                "compute_entropy": False,
                                "compute_std": True,
                                "std_quantile": 0.25}
        },
        "train_colvars": {
            "cvs": CVS,
            "common": {
                "dimension": 2,
                "lag_time": 1,
                "features_normalization": "mean_std",
                "architecture": {
                    "encoder": {
                        "layers": [16, 16],
                        "activation": ["leaky_relu"] * 2,
                        "dropout": [None] * 2,
                        "batchnorm": [False] * 2,
                    }
                },
                "training": {
                    "general": {"num_tries": 1, "seed": 42, "batch_size": 64,
                                "max_epochs": 60},
                    "optimizer": {"name": "Adam", "kwargs": {"lr": 1e-3}},
                    "plot_loss": False,
                },
            },
            "figures": {
                "fes": {"compute": True, "save": False, "num_bins": 40},
                "traj_projection": {"plot": True},
            },
        },
        "traj_cluster": {"run": False},
    }

    deep_cartograph(
        configuration=configuration,
        trajectory_data=[traj_path],
        topology_data=[top_path],
        supplementary_traj_data=[active_traj],
        supplementary_top_data=[active_pdb],
        output_folder=output_folder,
    )


def show_results(system_name: str, features: str, model: str) -> None:
    """Where does the active-conformation ensemble land on the solution CV?"""
    out = os.path.join(OUT, system_name, features)
    main_csv = os.path.join(out, "train_colvars", model, "traj_data",
                            system_name, "projected_trajectory.csv")
    sup_csv = os.path.join(out, "traj_projection", model,
                           "active_conformation", "projected_trajectory.csv")
    if not (os.path.exists(main_csv) and os.path.exists(sup_csv)):
        print(f"  {model}: projections missing under {out}")
        return
    main = pd.read_csv(main_csv).iloc[:, 0].to_numpy()
    sup = pd.read_csv(sup_csv).iloc[:, 0].to_numpy()
    # Fraction of solution frames within the active ensemble's CV1 band
    lo, hi = np.percentile(sup, [5, 95])
    frac = float(np.mean((main >= lo) & (main <= hi)))
    print(f"  {model}/{features}: active band CV1=[{lo:.2f},{hi:.2f}] — "
          f"{100 * frac:.1f}% of solution frames inside "
          f"({'conformational selection' if frac > 0.05 else 'induced fit?'})")


# ---------------------------------------------------------------------------
for name in ("peptide1", "peptide2", "peptide7"):
    for features in ("torsions", "distances", "all"):
        banner(f"{name} / {features}")
        run_deep_cartograph(name, features)
        for model in CVS:
            show_results(name, features, model)

banner("Done — artifacts under " + OUT)
