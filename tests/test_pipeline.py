"""End-to-end pipeline test: the full 7-step deep_cartograph workflow on the
synthetic CA system (the reference's test_deep_cartograph equivalent)."""

import os
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from deep_cartograph_tpu.pipeline import deep_cartograph


def pipeline_config():
    return {
        "analyze_geometry": {
            "run": True,
            "dt_per_frame": 1.0,
            "analysis": {
                "RMSD": {
                    "ca_rmsd": {
                        "title": "CA RMSD",
                        "selection": "name CA",
                        "fit_selection": "name CA",
                    }
                },
                "RMSF": {
                    "ca_rmsf": {
                        "title": "CA RMSF",
                        "selection": "name CA",
                        "fit_selection": "name CA",
                    }
                },
            },
        },
        "traj_augmentation": {"num_frames": 100, "traj_format": "dcd"},
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
                    },
                    "dihedral_groups": {
                        "tors": {
                            "selection": "name CA",
                            "periodic_encoding": True,
                            "search_mode": "virtual",
                        }
                    },
                },
            }
        },
        "filter_features": {
            "filter_settings": {
                "diptest_significance_level": None,
                "entropy_quantile": None,
                "std_quantile": 0.3,
            }
        },
        "train_colvars": {
            "cvs": ["pca", "tica", "ae"],
            "common": {
                "dimension": 2,
                "lag_time": 1,
                "features_normalization": "mean_std",
                "architecture": {
                    "encoder": {
                        "layers": [8],
                        "activation": ["tanh"],
                        "dropout": [None],
                        "batchnorm": [False],
                    }
                },
                "training": {
                    "general": {
                        "num_tries": 1,
                        "seed": 42,
                        "batch_size": 16,
                        "max_epochs": 15,
                        "shuffle": True,
                        "check_val_every_n_epoch": 1,
                    },
                    "early_stopping": {"patience": 30, "min_delta": 1e-6},
                    "optimizer": {"name": "Adam", "kwargs": {"lr": 1e-2}},
                    "plot_loss": False,
                },
            },
            "figures": {
                "fes": {"compute": True, "save": False, "num_bins": 30},
                "traj_projection": {"plot": True},
            },
        },
        "traj_projection": {},
        "traj_cluster": {
            "run": True,
            "output_structures": "centroids",
            "algorithm": "kmeans",
            "opt_num_clusters": True,
            "search_interval": [2, 4],
            "n_init": 3,
        },
    }


@pytest.mark.slow
def test_full_pipeline(ca_system, tmp_path):
    out = str(tmp_path / "pipeline")
    deep_cartograph(
        configuration=pipeline_config(),
        trajectory_data=[ca_system.dcd_path],
        topology_data=[ca_system.pdb_path],
        output_folder=out,
        restart=True,
    )

    # STEP 0 outputs
    assert os.path.exists(os.path.join(out, "analyze_geometry", "ca_rmsd_RMSD.png"))
    assert os.path.exists(os.path.join(out, "analyze_geometry", "ca_rmsf_RMSF.png"))
    # STEP 2 outputs
    colvars = os.path.join(out, "compute_features", "ca_example", "colvars.dat")
    assert os.path.exists(colvars)
    # STEP 3 outputs
    filtered = os.path.join(out, "filter_features", "filtered_features.txt")
    assert os.path.exists(filtered)
    kept = [l.strip() for l in open(filtered) if l.strip()]
    assert len(kept) > 2
    # STEP 4 outputs per CV
    for cv in ("pca", "tica", "ae"):
        cv_dir = os.path.join(out, "train_colvars", cv)
        assert os.path.exists(os.path.join(cv_dir, "model.zip")), cv
        proj = os.path.join(
            cv_dir, "traj_data", "ca_example", "projected_trajectory.csv"
        )
        assert os.path.exists(proj), cv
        df = pd.read_csv(proj)
        assert df.shape == (ca_system.coords.shape[0], 2)
        assert np.isfinite(df.to_numpy()).all()
        # PLUMED deployment zips
        plumed_dir = os.path.join(cv_dir, "traj_data", "ca_example", "plumed_inputs")
        assert os.path.exists(
            os.path.join(plumed_dir, f"plumed_{cv}_unbiased.zip")
        )
    # STEP 6 outputs
    for cv in ("pca", "tica", "ae"):
        cluster_dir = os.path.join(out, "traj_cluster", cv)
        proj = os.path.join(cluster_dir, "ca_example", "projected_trajectory.csv")
        assert os.path.exists(proj), cv
        df = pd.read_csv(proj)
        assert "cluster" in df.columns and "centroid" in df.columns
        # centroid PDBs extracted
        centroids = os.path.join(cluster_dir, "centroids")
        assert len(list(Path(centroids).glob("cluster_*.pdb"))) >= 2

    # Restart: re-running must skip without errors and keep outputs
    deep_cartograph(
        configuration=pipeline_config(),
        trajectory_data=[ca_system.dcd_path],
        topology_data=[ca_system.pdb_path],
        output_folder=out,
        restart=True,
    )


@pytest.mark.slow
def test_pipeline_survives_failed_cv(ca_system, tmp_path, monkeypatch):
    """A CV family whose training never validates is dropped with an error;
    the remaining CVs still get projected and clustered (the reference
    crashes in traj_cluster on the missing projection files)."""
    from deep_cartograph_tpu.cv import deep as deep_mod

    monkeypatch.setattr(
        deep_mod.DeepTICACalculator, "_validate_result",
        lambda self, result: False,
    )

    config = pipeline_config()
    config["train_colvars"]["cvs"] = ["pca", "deep_tica"]
    config["train_colvars"]["common"]["training"]["general"]["num_tries"] = 1
    config["train_colvars"]["common"]["training"]["general"]["max_epochs"] = 5
    out = str(tmp_path / "pipeline_failed_cv")
    deep_cartograph(
        configuration=config,
        trajectory_data=[ca_system.dcd_path],
        topology_data=[ca_system.pdb_path],
        output_folder=out,
    )
    # pca completed through clustering; deep_tica was skipped downstream
    assert os.path.exists(
        os.path.join(out, "train_colvars", "pca", "traj_data", "ca_example",
                     "projected_trajectory.csv")
    )
    assert os.path.isdir(os.path.join(out, "traj_cluster", "pca"))
    assert not os.path.isdir(os.path.join(out, "traj_cluster", "deep_tica"))
