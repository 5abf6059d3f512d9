"""Beta-VAE experiments: why the KL term needs annealing.

Port of /root/reference/examples/notebooks/5.beta-vae/validation.ipynb:
train the VAE CV under four KL-annealing regimes and watch the balance
between reconstruction and regularization —

  Test 1: naive beta = 1 from epoch 0 (on the reference's 1AH7 data this
          produces full posterior collapse; on this strongly-bimodal toy
          data the effect is graded — the latent shrinks toward the prior),
  Test 2: linear annealing 0 -> 1e-3 after a warm-up,
  Test 3: linear annealing 1e-5 -> 1e-2,
  Test 4: cyclical annealing (the beta-VAE recipe the reference lands on).

The reference trains on bundled GaMD data of protein 1AH7; this port uses
the generated bimodal-torsion peptide. For each regime the script reports
the CV1 variance and the two-state separation of the projected trajectory
(state A = first half of frames, state B = second half): a collapsing
posterior drives both toward zero as KL pressure rises.

Run: python 5_beta_vae.py    (writes ./output_beta_vae/)
"""

import os
import shutil

import numpy as np
import pandas as pd

from _common import banner, make_peptide_system

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "output_beta_vae")

system = make_peptide_system(os.path.join(OUT, "input"), n_residues=6,
                             n_frames=240, seed=47)

# Featurize once; every VAE variant trains from the same colvars file.
banner("Featurize (backbone torsions)")
from deep_cartograph_tpu.tools.compute_features import compute_features

colvars_paths = compute_features(
    configuration={
        "plumed_settings": {
            "traj_stride": 1,
            "features": {
                "dihedral_groups": {
                    "tor": {
                        "selection": "not name H* and backbone and not name O",
                        "periodic_encoding": True,
                        "search_mode": "real",
                    }
                }
            },
        }
    },
    trajectory_data=[system.dcd_path],
    topology_data=[system.pdb_path],
    output_folder=os.path.join(OUT, "compute_features"),
)

ANNEALING_TESTS = {
    # Test 1 — posterior collapse: full KL pressure from epoch 0
    "test_1_naive_beta_1": {"type": "linear", "start_beta": 1.0,
                            "max_beta": 1.0},
    # Test 2 — warm-up then gentle linear ramp (reference: start_epoch 1000
    # over 5000 epochs; scaled to this run's 120 epochs)
    "test_2_linear_0_to_1e-3": {"type": "linear", "start_beta": 0.0,
                                "max_beta": 1e-3, "start_epoch": 30,
                                "n_epochs_anneal": 60},
    # Test 3 — ramp from a tiny nonzero beta to 1e-2
    "test_3_linear_1e-5_to_1e-2": {"type": "linear", "start_beta": 1e-5,
                                   "max_beta": 1e-2, "start_epoch": 10,
                                   "n_epochs_anneal": 80},
    # Test 4 — cyclical annealing
    "test_4_cyclical": {"type": "cyclical", "start_beta": 0.0,
                        "max_beta": 1e-2, "start_epoch": 10,
                        "n_epochs_anneal": 90, "n_cycles": 3},
}


def run_vae(tag: str, kl_annealing: dict) -> None:
    from deep_cartograph_tpu.tools.train_colvars import train_colvars

    out = os.path.join(OUT, tag)
    if os.path.exists(out):
        shutil.rmtree(out)
    train_colvars(
        configuration={
            "cvs": ["vae"],
            "common": {
                "dimension": 1,
                "features_normalization": "mean_std",
                "architecture": {
                    "encoder": {
                        "layers": [20, 20],
                        "activation": ["leaky_relu"] * 2,
                        "dropout": [None] * 2,
                        "batchnorm": [False] * 2,
                    }
                },
                "training": {
                    "general": {"num_tries": 1, "seed": 42, "batch_size": 64,
                                "max_epochs": 120,
                                "check_val_every_n_epoch": 1},
                    "early_stopping": {"patience": 120, "min_delta": 1e-6},
                    "optimizer": {"name": "Adam", "kwargs": {"lr": 1e-3}},
                    "kl_annealing": kl_annealing,
                    "save_loss": True,
                    "plot_loss": True,
                },
            },
            "figures": {
                "fes": {"compute": False, "save": False},
                "traj_projection": {"plot": True},
            },
        },
        train_colvars_paths=colvars_paths,
        train_topologies=[system.pdb_path],
        trajectory_names=["peptide"],
        output_folder=out,
    )

    proj = os.path.join(out, "vae", "traj_data", "peptide",
                        "projected_trajectory.csv")
    if os.path.exists(proj):
        cv1 = pd.read_csv(proj).iloc[:, 0].to_numpy()
        var = float(np.var(cv1))
        half = len(cv1) // 2
        a, b = cv1[:half], cv1[half:]
        sep = abs(a.mean() - b.mean()) / np.sqrt(
            0.5 * (a.var() + b.var()) + 1e-12)
        verdict = ("POSTERIOR COLLAPSE" if sep < 0.5
                   else "informative CV" if sep > 2 else "weak CV")
        print(f"  {tag}: CV1 variance {var:.5f}, "
              f"state separation {sep:.2f} sigma -> {verdict}")
    else:
        print(f"  {tag}: training did not produce a valid model")


for tag, kl in ANNEALING_TESTS.items():
    banner(tag + f"  (kl_annealing={kl})")
    run_vae(tag, kl)

banner("Done — artifacts under " + OUT)
