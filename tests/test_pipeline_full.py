"""Extended pipeline test: every data role (train / validation /
supplementary / seed / waypoints) and every CV family in one run."""

import os
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from deep_cartograph_tpu.pipeline import deep_cartograph
from tests.fixtures import make_ca_system, write_ca_pdb


def full_config():
    return {
        "analyze_geometry": {"run": False, "analysis": {}},
        "traj_augmentation": {
            "num_frames": 50,
            "interpolation_method": "pchip",
            "traj_format": "dcd",
        },
        "compute_features": {
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
                            "skip_bonded_atoms": False,
                        }
                    }
                },
            }
        },
        "filter_features": {
            "filter_settings": {
                "diptest_significance_level": None,
                "std_quantile": 0.2,
            }
        },
        "train_colvars": {
            "cvs": ["pca", "tica", "htica", "ae", "vae", "deep_tica", "umap"],
            "common": {
                "dimension": 2,
                "lag_time": 1,
                "num_subspaces": 2,
                "subspaces_dimension": 2,
                "features_normalization": "mean_std",
                "architecture": {
                    "encoder": {
                        "layers": [8],
                        "activation": ["tanh"],
                    }
                },
                "training": {
                    "general": {
                        "num_tries": 1,
                        "seed": 42,
                        "batch_size": 16,
                        "max_epochs": 8,
                        "shuffle": True,
                        "check_val_every_n_epoch": 1,
                    },
                    "early_stopping": {"patience": 20, "min_delta": 1e-6},
                    "optimizer": {"name": "Adam", "kwargs": {"lr": 1e-2}},
                    "kl_annealing": {
                        "type": "linear",
                        "start_beta": 1e-6,
                        "max_beta": 0.01,
                        "start_epoch": 2,
                        "n_cycles": 1,
                        "n_epochs_anneal": 3,
                    },
                    "plot_loss": False,
                },
            },
            # per-CV override block exercising the recursive merge
            "pca": {"dimension": 2},
            "figures": {
                "fes": {"compute": False},
                "traj_projection": {"plot": False},
            },
        },
        "traj_projection": {
            "figures": {"fes": {"compute": False}}
        },
        "traj_cluster": {
            "run": True,
            "output_structures": None,
            "algorithm": "kmeans",
            "opt_num_clusters": False,
            "num_clusters": 2,
            "n_init": 3,
        },
    }


@pytest.mark.slow
def test_pipeline_all_roles_all_cvs(tmp_path):
    base = tmp_path
    main = make_ca_system(str(base / "main"), 12, 60, seed=1)
    val = make_ca_system(str(base / "val"), 12, 30, seed=2)
    sup = make_ca_system(str(base / "sup"), 12, 20, seed=3)
    seed_sys = make_ca_system(str(base / "seed"), 12, 10, seed=4)

    # Waypoints: two single-structure PDBs
    waypoints_dir = base / "waypoints"
    waypoints_dir.mkdir()
    write_ca_pdb(str(waypoints_dir / "wp1.pdb"), main.coords[0])
    write_ca_pdb(str(waypoints_dir / "wp2.pdb"), main.coords[-1])

    out = str(base / "pipeline")
    deep_cartograph(
        configuration=full_config(),
        trajectory_data=[main.dcd_path],
        topology_data=[main.pdb_path],
        validation_trajectory_data=[val.dcd_path],
        validation_topology_data=[val.pdb_path],
        seed_trajectory_data=[seed_sys.dcd_path],
        seed_topology_data=[seed_sys.pdb_path],
        supplementary_traj_data=[sup.dcd_path],
        supplementary_top_data=[sup.pdb_path],
        waypoints_data=str(waypoints_dir),
        output_folder=out,
        restart=True,
    )

    # Augmented seed trajectory became a training trajectory
    assert os.path.exists(os.path.join(out, "traj_augmentation"))
    aug = list(Path(out, "traj_augmentation").glob("*_augmented_*.dcd"))
    assert len(aug) == 1

    # Feature computation for all four data roles
    for folder in (
        "compute_features",
        "compute_val_features",
        "compute_ref_features",
        "compute_waypoint_features",
    ):
        assert os.path.isdir(os.path.join(out, folder)), folder

    # Waypoint screens recorded in the filter summary
    summary = pd.read_csv(os.path.join(out, "filter_features", "filter_summary.csv"))
    assert "waypoint_difference" in summary.columns

    # All 7 CVs trained with projections for both training trajectories
    for cv in ("pca", "tica", "htica", "ae", "vae", "deep_tica", "umap"):
        cv_dir = os.path.join(out, "train_colvars", cv)
        assert os.path.exists(os.path.join(cv_dir, "model.zip")), cv
        for traj_name in ("ca_example",):
            proj = os.path.join(
                cv_dir, "traj_data", traj_name, "projected_trajectory.csv"
            )
            assert os.path.exists(proj), (cv, traj_name)
            assert np.isfinite(pd.read_csv(proj).to_numpy()).all()

    # Supplementary projection (STEP 5) ran per CV
    for cv in ("pca", "tica"):
        sup_proj = os.path.join(
            out, "traj_projection", cv, "ca_example", "projected_trajectory.csv"
        )
        assert os.path.exists(sup_proj), cv

    # Clustering (STEP 6) with supplementary assignment
    for cv in ("pca",):
        cluster_dir = os.path.join(out, "traj_cluster", cv)
        assert os.path.exists(
            os.path.join(cluster_dir, "ca_example", "projected_trajectory.csv")
        )
        sup_cluster = os.path.join(
            cluster_dir, "sup_ca_example", "projected_trajectory.csv"
        )
        assert os.path.exists(sup_cluster)
        df = pd.read_csv(sup_cluster)
        assert "cluster" in df.columns
