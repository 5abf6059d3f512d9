"""Introduction: the one-shot `deep_cartograph()` workflow, three ways.

Port of /root/reference/examples/notebooks/0.introduction (config_distances.yml,
config_phi_psi.yml, config_muller_brown.yml + traj_augmentation/configuration.yml):
run the full 7-step workflow end-to-end with

  1. a DISTANCES feature set (dip-test filtering, like config_distances.yml),
  2. a PHI/PSI torsion feature set (real-dihedral search with periodic
     encoding, like config_phi_psi.yml),
  3. an AUGMENTED trajectory (interpolation_factor-style frame doubling via
     the traj_augmentation step, like traj_augmentation/configuration.yml),

each training the same CV families the reference configs request
(pca / ae / vae / tica / deep_tica) at dimension 1.

The reference notebooks read bundled binary data (alanine dipeptide); this
port generates an equivalent bimodal-torsion peptide programmatically.

Run: python 0_introduction.py    (writes ./output_introduction/)
"""

import os
import shutil

import pandas as pd

from _common import banner, make_peptide_system

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "output_introduction")

system = make_peptide_system(os.path.join(OUT, "input"), n_residues=6,
                             n_frames=200, seed=31)

CVS = ["pca", "ae", "vae", "tica", "deep_tica"]


def base_config(features: dict, filter_settings: dict) -> dict:
    """The reference 0.introduction config shape: tiny encoder/decoder,
    Adam, dimension-1 CVs (cf. config_distances.yml)."""
    return {
        "compute_features": {
            "plumed_settings": {"traj_stride": 1, "features": features}
        },
        "filter_features": {"filter_settings": filter_settings},
        "train_colvars": {
            "cvs": CVS,
            "common": {
                "dimension": 1,
                "lag_time": 1,
                # keeps the deep-TICA generalized eigenproblem well-conditioned
                # on this small toy dataset: the slowest mode is nearly
                # deterministic switching (eigenvalue -> 1), so finite-sample
                # noise can push it past 1 without strong shrinkage
                "tica_regularization": 1e-2,
                "features_normalization": "mean_std",
                "architecture": {
                    "encoder": {
                        "layers": [20, 20, 2],
                        "activation": ["leaky_relu"] * 3,
                        "dropout": [None] * 3,
                        "batchnorm": [False] * 3,
                    }
                },
                "training": {
                    "general": {
                        "num_tries": 2,
                        "seed": 42,
                        "lengths": [0.8, 0.2],
                        "batch_size": 64,
                        "max_epochs": 80,
                        "shuffle": True,
                        "random_split": True,
                        "check_val_every_n_epoch": 1,
                        "save_check_every_n_epoch": 1,
                    },
                    "early_stopping": {"patience": 80, "min_delta": 1e-5},
                    "optimizer": {
                        "name": "Adam",
                        "kwargs": {"lr": 1e-3, "weight_decay": 0.0},
                    },
                    "save_loss": True,
                    "plot_loss": True,
                },
            },
            "figures": {
                "fes": {"compute": False, "save": False},
                "traj_projection": {"plot": True, "num_bins": 100,
                                    "bandwidth": 0.25, "alpha": 0.6,
                                    "cmap": "turbo", "marker_size": 12},
            },
        },
        "traj_cluster": {"run": False},
    }


def run_and_report(tag: str, config: dict, as_seed: bool = False) -> None:
    from deep_cartograph_tpu.pipeline import deep_cartograph

    out = os.path.join(OUT, tag)
    if os.path.exists(out):
        shutil.rmtree(out)
    # as_seed routes the trajectory through STEP 1 traj_augmentation
    # (augmentation only applies to seed trajectories, as in the reference).
    data_kwargs = (
        {"seed_trajectory_data": [system.dcd_path],
         "seed_topology_data": [system.pdb_path]}
        if as_seed
        else {"trajectory_data": [system.dcd_path],
              "topology_data": [system.pdb_path]}
    )
    deep_cartograph(configuration=config, output_folder=out, **data_kwargs)
    for cv in CVS:
        proj = os.path.join(out, "train_colvars", cv, "traj_data", "peptide",
                            "projected_trajectory.csv")
        if os.path.exists(proj):
            df = pd.read_csv(proj)
            print(f"  {cv}: projected {df.shape[0]} frames, "
                  f"CV1 span {df.iloc[:, 0].max() - df.iloc[:, 0].min():.3f}")
        else:
            print(f"  {cv}: no valid model (skipped downstream)")


# ---------------------------------------------------------------------------
banner("Workflow 1: distance features + dip-test filter (config_distances.yml)")
run_and_report("distances", base_config(
    features={
        "distance_groups": {
            "dist": {
                "first_selection": "name O",
                "second_selection": "name N or name CA",
                "first_stride": 1,
                "second_stride": 1,
                "skip_neigh_residues": False,
                "skip_bonded_atoms": True,
            }
        }
    },
    filter_settings={"compute_diptest": True, "compute_entropy": False,
                     "compute_std": False},
))

# ---------------------------------------------------------------------------
banner("Workflow 2: backbone phi/psi torsions (config_phi_psi.yml)")
run_and_report("phi_psi", base_config(
    features={
        "dihedral_groups": {
            "backbone_tor": {
                "selection": "not name H* and backbone and not name O",
                "periodic_encoding": True,
                "search_mode": "real",
            }
        }
    },
    filter_settings={"compute_diptest": False, "compute_entropy": False,
                     "compute_std": False},
))

# ---------------------------------------------------------------------------
banner("Workflow 3: augmented trajectory (traj_augmentation config)")
# interpolation_factor: 2 — the augmentation step doubles the frame count
# before featurization (reference traj_augmentation/configuration.yml).
cfg = base_config(
    features={
        "distance_groups": {
            "dist": {
                "first_selection": "name CA",
                "second_selection": "name CA",
                "first_stride": 1,
                "second_stride": 2,
                "skip_neigh_residues": True,
                "skip_bonded_atoms": False,
            }
        }
    },
    filter_settings={"compute_diptest": False, "compute_entropy": False,
                     "compute_std": False},
)
cfg["traj_augmentation"] = {
    "num_frames": 2 * system.coords.shape[0],  # interpolation_factor: 2
    "interpolation_method": "pchip",
    "traj_format": "dcd",
}
run_and_report("augmented", cfg, as_seed=True)

banner("Done — artifacts under " + OUT)
