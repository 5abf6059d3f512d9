"""Example 4: beta-VAE CV with KL annealing, exported for biased MD.

Mirrors the reference's VAE training configs
(examples/miscellaneous/vae_training_examples) and the GROMACS deployment
inputs (examples/miscellaneous/gromacs_biased_simulations): train a VAE CV
with a cyclically annealed beta, then export the biased PLUMED input
(PYTORCH_MODEL + OPES_METAD) that drives enhanced sampling in an MD engine.

Run:  python run_vae_deployment.py
"""

import os
import sys
import zipfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

from tests.fixtures import make_ca_system
from deep_cartograph_tpu.tools.compute_features import compute_features
from deep_cartograph_tpu.tools.train_colvars import train_colvars


def main() -> None:
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results")
    os.makedirs(out, exist_ok=True)
    system = make_ca_system(out, n_residues=12, n_frames=200, seed=3)

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
                            "skip_bonded_atoms": False,
                        }
                    }
                },
            }
        },
        trajectory_data=system.dcd_path,
        topology_data=system.pdb_path,
        output_folder=os.path.join(out, "compute_features"),
    )

    train_colvars(
        configuration={
            "cvs": ["vae"],
            "common": {
                "dimension": 2,
                "features_normalization": "mean_std",
                "architecture": {
                    "encoder": {"layers": [16, 8], "dropout": [0.0, 0.0]},
                },
                "training": {
                    "general": {
                        "num_tries": 1, "seed": 42, "lengths": [0.8, 0.2],
                        "batch_size": 64, "max_epochs": 60, "shuffle": True,
                        "random_split": True, "check_val_every_n_epoch": 1,
                        "save_check_every_n_epoch": 1,
                    },
                    "early_stopping": {"patience": 100, "min_delta": 1e-6},
                    "optimizer": {"name": "Adam",
                                  "kwargs": {"lr": 1e-2, "weight_decay": 0.0}},
                    "kl_annealing": {
                        "type": "cyclical", "start_beta": 0.0,
                        "max_beta": 0.4, "start_epoch": 5,
                        "n_epochs_anneal": 20, "n_cycles": 2,
                    },
                    "save_loss": True, "plot_loss": True,
                    "model_to_save": "best",
                },
                "bias": {"method": "opes_metad",
                         "args": {"barrier_kjmol": 40}},
            },
        },
        train_colvars_paths=colvars,
        train_topologies=[system.pdb_path],
        output_folder=os.path.join(out, "train_colvars"),
    )

    biased = os.path.join(
        out, "train_colvars", "vae", "traj_data",
        os.path.splitext(os.path.basename(colvars[0]))[0],
        "plumed_inputs", "plumed_vae_biased.zip",
    )
    with zipfile.ZipFile(biased) as zf:
        names = zf.namelist()
        dat = next(n for n in names if n.endswith(".dat"))
        text = zf.read(dat).decode()
    assert "PYTORCH_MODEL" in text and "OPES_METAD" in text
    print("biased PLUMED input ready:", biased)
    print("actions:", [l.split()[1].rstrip(":") for l in text.splitlines()
                       if ": " in l and not l.startswith("#")][:8])


if __name__ == "__main__":
    main()
