"""Peptide-ensemble screening: map several peptides with several feature sets.

Port of /root/reference/examples/notebooks/2.peptide_ensemble/peptide.ipynb:
the conformational-selection question — for each peptide of an ensemble, run
the full workflow with TORSIONS, DISTANCES, and ALL features, passing the
"active conformation" reference ensemble as supplementary data so it is
projected onto the learned CV next to the solution ensemble. If the peptide
visits its bioactive conformation in solution, the supplementary frames land
inside a populated basin of the solution FES.

The reference notebook reads bundled xtc/pdb data for peptides 1/2/7; this
port generates three bimodal-torsion peptides programmatically and uses the
second metastable state as each peptide's "active conformation".

Run: python 2_peptide_ensemble.py    (writes ./output_peptide_ensemble/)
"""

import os
import shutil

import numpy as np
import pandas as pd

from _common import banner, make_peptide_system

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


def make_active_conformation(system, folder: str) -> tuple:
    """Extract the second metastable state's frames as the 'active
    conformation' reference ensemble (stand-in for the reference's
    active_conformation directory)."""
    from deep_cartograph_tpu.io.dcd import write_dcd

    os.makedirs(folder, exist_ok=True)
    n = system.coords.shape[0]
    active = system.coords[int(0.8 * n):]  # deep inside the second state
    dcd = os.path.join(folder, "active_conformation.dcd")
    write_dcd(dcd, active)
    pdb = os.path.join(folder, "active_conformation.pdb")
    shutil.copy(system.pdb_path, pdb)
    return dcd, pdb


def run_deep_cartograph(system_name: str, system, features: str) -> None:
    from deep_cartograph_tpu.pipeline import deep_cartograph

    output_folder = os.path.join(OUT, system_name, features)
    if os.path.exists(output_folder):
        shutil.rmtree(output_folder)

    active_dcd, active_pdb = make_active_conformation(
        system, os.path.join(OUT, system_name, "input_active"))

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
        trajectory_data=[system.dcd_path],
        topology_data=[system.pdb_path],
        supplementary_traj_data=[active_dcd],
        supplementary_top_data=[active_pdb],
        output_folder=output_folder,
    )


def show_results(system_name: str, features: str, model: str) -> None:
    """Where does the active-conformation ensemble land on the solution CV?"""
    out = os.path.join(OUT, system_name, features)
    main_csv = os.path.join(out, "train_colvars", model, "traj_data",
                            "peptide", "projected_trajectory.csv")
    sup_csv = os.path.join(out, "traj_projection", model,
                           "active_conformation", "projected_trajectory.csv")
    if not (os.path.exists(main_csv) and os.path.exists(sup_csv)):
        print(f"  {model}: projections missing under {base}")
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
systems = {
    "peptide1": make_peptide_system(os.path.join(OUT, "peptide1", "input"),
                                    n_residues=6, n_frames=160, seed=101),
    "peptide2": make_peptide_system(os.path.join(OUT, "peptide2", "input"),
                                    n_residues=7, n_frames=160, seed=102),
    "peptide7": make_peptide_system(os.path.join(OUT, "peptide7", "input"),
                                    n_residues=5, n_frames=160, seed=107),
}

for name, system in systems.items():
    for features in ("torsions", "distances", "all"):
        banner(f"{name} / {features}")
        run_deep_cartograph(name, system, features)
        for model in CVS:
            show_results(name, features, model)

banner("Done — artifacts under " + OUT)
