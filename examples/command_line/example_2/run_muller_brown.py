"""Example 2: Muller-Brown free-energy landscape end to end.

Generates Langevin samples of the classic 2-D potential on device, learns
linear and deep CVs from the embedded coordinates, and plots the FES along
the learned CV — the metastable basins appear as separate free-energy wells.

Run:  python run_muller_brown.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "..", ".."))

import numpy as np

from deep_cartograph_tpu.cv import cv_calculators_map
from deep_cartograph_tpu.data.muller_brown import (
    as_ca_trajectory,
    basin_labels,
    sample_trajectory,
)
from deep_cartograph_tpu.fes import plot_fes
from deep_cartograph_tpu.geom.engine import Featurizer
from deep_cartograph_tpu.io.colvars import write_colvars
from deep_cartograph_tpu.io.topology import Topology
from tests.fixtures import write_ca_pdb


def main() -> None:
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results")
    os.makedirs(out, exist_ok=True)

    print("Sampling the Muller-Brown potential on device ...")
    xy = sample_trajectory(n_frames=8000, stride=20, kt=20.0, seed=3)
    labels = basin_labels(xy)
    print("basin populations:", np.bincount(labels, minlength=3))

    coords = as_ca_trajectory(xy)
    pdb = os.path.join(out, "mb.pdb")
    write_ca_pdb(pdb, coords[0])

    feature_labels = ["dist-@CA_1-@CA_2", "dist-@CA_1-@CA_3"]
    top = Topology.from_pdb(pdb)
    features = Featurizer(top, feature_labels)(coords)
    colvars = os.path.join(out, "colvars.dat")
    t = np.arange(features.shape[0], dtype=np.float32)
    write_colvars(colvars, np.column_stack([t, features]),
                  ["time"] + feature_labels, fmt="%.6f")

    config = {
        "dimension": 1,
        "lag_time": 5,
        "features_normalization": "mean_std",
        "architecture": {"encoder": {"layers": [16, 16],
                                      "activation": ["tanh", "tanh"]}},
        "training": {
            "general": {"num_tries": 2, "seed": 42, "batch_size": 512,
                        "max_epochs": 150, "shuffle": True},
            "early_stopping": {"patience": 40, "min_delta": 1e-6},
            "optimizer": {"name": "Adam", "kwargs": {"lr": 5e-3}},
            "plot_loss": True,
        },
        "bias": {"method": "opes_metad", "args": {
            "temperature": 300.0, "sigma": 0.05, "pace": 500,
            "grid_min": -1.0, "grid_max": 1.0, "grid_bin": 300,
            "height": 1.0, "bias_factor": 10.0, "barrier": 50.0,
            "observation_steps": 100, "compression_threshold": 0.1},
            "add_rmsd_restraint": False, "align_waypoint_structures": True,
            "rmsd_restraint_k": 5000.0, "rmsd_restraint_eq": 0.4},
    }
    for cv_name in ("tica", "deep_tica"):
        print(f"Training {cv_name} ...")
        calc = cv_calculators_map[cv_name](configuration=dict(config),
                                           output_path=out)
        calc.load_training_data([colvars], [pdb],
                                features_list=feature_labels)
        projection = calc.run()
        cv = projection.to_numpy()[:, 0]
        plot_fes(
            data=cv,
            cv_labels=[f"{cv_name} CV"],
            settings={"compute": True, "save": False, "temperature": 300,
                      "bandwidth": 0.05, "num_bins": 120, "max_fes": 40},
            output_path=os.path.join(out, f"fes_{cv_name}"),
            num_blocks=10,
        )
        sep = abs(cv[labels == 0].mean() - cv[labels == 1].mean())
        print(f"  basin separation along {cv_name}: {sep:.3f}")
    print(f"Results in {out}")


if __name__ == "__main__":
    main()
