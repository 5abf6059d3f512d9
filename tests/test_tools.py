"""Tool-level tests: analyze_geometry, traj_augmentation, align_trajectories,
and multi-trajectory flows."""

import os
from pathlib import Path

import numpy as np
import pytest

from deep_cartograph_tpu.geom.analysis import RMSD, RMSF, dRMSD
from deep_cartograph_tpu.io.dcd import write_dcd
from deep_cartograph_tpu.io.traj import read_traj
from deep_cartograph_tpu.tools.align_trajectories import align_trajectories
from deep_cartograph_tpu.tools.analyze_geometry import analyze_geometry
from deep_cartograph_tpu.tools.traj_augmentation import traj_augmentation
from tests.fixtures import make_ca_system


def test_rmsd_first_frame_zero(ca_system):
    rmsd = RMSD(
        ca_system.dcd_path, ca_system.pdb_path, "name CA", "name CA", None
    )
    assert rmsd.shape == (ca_system.coords.shape[0],)
    # first frame aligned to itself -> ~0
    assert rmsd[0] < 1e-3
    assert rmsd.max() > 0.1  # the trajectory moves


def test_rmsd_invariant_to_rigid_motion(ca_system, tmp_path):
    # Apply a random rigid transform to every frame: RMSD must be unchanged
    rng = np.random.default_rng(0)
    theta = 0.7
    R = np.array(
        [
            [np.cos(theta), -np.sin(theta), 0],
            [np.sin(theta), np.cos(theta), 0],
            [0, 0, 1],
        ],
        np.float32,
    )
    moved = ca_system.coords @ R.T + np.array([5.0, -3.0, 2.0], np.float32)
    moved_path = str(tmp_path / "moved.dcd")
    write_dcd(moved_path, moved)
    base = RMSD(ca_system.dcd_path, ca_system.pdb_path, "name CA", "name CA")
    rotated = RMSD(moved_path, ca_system.pdb_path, "name CA", "name CA")
    np.testing.assert_allclose(rotated, base, atol=1e-3)


def test_rmsf_shape_and_positivity(ca_system):
    rmsf, residues = RMSF(
        ca_system.dcd_path, ca_system.pdb_path, "name CA", "name CA"
    )
    assert len(rmsf) == ca_system.n_residues
    assert residues == list(range(1, ca_system.n_residues + 1))
    assert all(v > 0 for v in rmsf)


def test_drmsd_zero_for_reference(ca_system):
    d = dRMSD(
        ca_system.dcd_path,
        ca_system.pdb_path,
        "name CA",
        1,
        ca_system.pdb_path,
    )
    assert d.shape == (ca_system.coords.shape[0],)
    # Frame 0 is the reference structure -> dRMSD ~ 0
    assert d[0] < 1e-4
    assert d.max() > 0.01


def test_analyze_geometry_tool(ca_system, tmp_path):
    out = str(tmp_path / "geom")
    analyze_geometry(
        configuration={
            "run": True,
            "dt_per_frame": 2.0,
            "analysis": {
                "RMSD": {
                    "ca": {
                        "title": "CA",
                        "selection": "name CA",
                        "fit_selection": "name CA",
                    }
                },
                "dRMSD": {
                    "ca_d": {
                        "title": "CA dRMSD",
                        "selection": "name CA",
                        "selection_stride": 1,
                    }
                },
            },
        },
        trajectories=[ca_system.dcd_path],
        topologies=[ca_system.pdb_path],
        ref_topologies=None,
        output_folder=out,
    )
    assert os.path.exists(os.path.join(out, "ca_RMSD.png"))
    assert os.path.exists(os.path.join(out, "ca_d_dRMSD.png"))
    # CSVs live in per-analysis subfolders (same-category analyses would
    # otherwise overwrite each other's identically-keyed files)
    assert len(list(Path(out, "ca").glob("*.csv"))) >= 1
    assert len(list(Path(out, "ca_d").glob("*.csv"))) >= 1


def test_traj_augmentation_tool(ca_system, tmp_path):
    out = str(tmp_path / "aug")
    trajs, tops = traj_augmentation(
        configuration={
            "num_frames": 150,
            "keep_original_frames": True,
            "interpolation_method": "pchip",
            "traj_format": "dcd",
        },
        trajectory_data=[ca_system.dcd_path],
        topology_data=[ca_system.pdb_path],
        output_folder=out,
    )
    assert len(trajs) == 1
    coords = read_traj(trajs[0], tops[0])
    assert coords.shape == (150, ca_system.n_residues, 3)
    # original frames preserved (keep_original_frames=True)
    np.testing.assert_allclose(coords[0], ca_system.coords[0], atol=1e-2)
    # interpolation is smooth: consecutive frames close
    deltas = np.linalg.norm(np.diff(coords, axis=0), axis=-1).max()
    assert deltas < 2.0


def test_traj_augmentation_replicas_with_noise(ca_system, tmp_path):
    out = str(tmp_path / "aug_noise")
    trajs, tops = traj_augmentation(
        configuration={
            "num_frames": 80,
            "interpolation_method": "pchip",
            "noise_std": 0.05,
            "traj_format": "dcd",
        },
        trajectory_data=[ca_system.dcd_path],
        topology_data=[ca_system.pdb_path],
        num_replicas=2,
        output_folder=out,
    )
    assert len(trajs) == 2
    a = read_traj(trajs[0], tops[0])
    b = read_traj(trajs[1], tops[1])
    # different seeds -> different noise
    assert np.abs(a - b).max() > 1e-3


def test_align_trajectories_tool(ca_system, tmp_path):
    # Build a rigidly displaced copy of the system and align it back
    rng = np.random.default_rng(1)
    theta = 1.1
    R = np.array(
        [
            [1, 0, 0],
            [0, np.cos(theta), -np.sin(theta)],
            [0, np.sin(theta), np.cos(theta)],
        ],
        np.float32,
    )
    moved = ca_system.coords @ R.T + np.array([10.0, 0.0, -4.0], np.float32)
    moved_dir = tmp_path / "moved_sys"
    moved_sys = make_ca_system(str(moved_dir), ca_system.n_residues, 5, seed=7)
    write_dcd(moved_sys.dcd_path, moved[:5])

    out = str(tmp_path / "aligned")
    align_trajectories(
        trajectory_data=[moved_sys.dcd_path],
        topology_data=[moved_sys.pdb_path],
        ref_topology=ca_system.pdb_path,
        output_folder=out,
    )
    aligned_path = os.path.join(out, Path(moved_sys.dcd_path).name)
    assert os.path.exists(aligned_path)
    aligned = read_traj(aligned_path, ca_system.pdb_path)
    # After alignment the displaced frames should sit on the originals
    for f in range(5):
        err = np.abs(aligned[f] - ca_system.coords[f]).max()
        assert err < 0.5, (f, err)
    assert os.path.exists(os.path.join(out, "ca_example.pdb"))


def test_multi_trajectory_compute_and_filter(tmp_path):
    """Two trajectories of the same system: compute + filter across both."""
    from deep_cartograph_tpu.tools.compute_features import compute_features
    from deep_cartograph_tpu.tools.filter_features import filter_features
    from deep_cartograph_tpu.utils.common import read_features_list

    sys_dir = tmp_path / "multi"
    s1 = make_ca_system(str(sys_dir / "a"), 10, 40, seed=1)
    s2 = make_ca_system(str(sys_dir / "b"), 10, 40, seed=2)
    config = {
        "plumed_settings": {
            "features": {
                "distance_groups": {
                    "ca": {
                        "first_selection": "name CA",
                        "second_selection": "name CA",
                        "first_stride": 1,
                        "second_stride": 1,
                        "skip_neigh_residues": True,
                        "skip_bonded_atoms": False,
                    }
                }
            }
        }
    }
    colvars = compute_features(
        configuration=config,
        trajectory_data=[s1.dcd_path, s2.dcd_path],
        topology_data=[s1.pdb_path, s2.pdb_path],
        output_folder=str(tmp_path / "cf"),
    )
    assert len(colvars) == 2
    out = filter_features(
        configuration={"filter_settings": {"diptest_significance_level": None,
                                           "std_quantile": 0.25}},
        colvars_paths=colvars,
        topologies=[s1.pdb_path, s2.pdb_path],
        output_folder=str(tmp_path / "ff"),
    )
    kept = read_features_list(out)
    assert len(kept) > 5


def test_traj_cluster_run_false_skips_validation(tmp_path):
    """run=False must not require the CV trajectory files to exist — the
    reference hard-exits on validation before its run gate
    (traj_cluster_workflow.py:70-82); we gate first."""
    from deep_cartograph_tpu.tools.traj_cluster import traj_cluster

    out = traj_cluster(
        configuration={"run": False},
        cv_traj_paths=[str(tmp_path / "does_not_exist.csv")],
        output_folder=str(tmp_path / "tc"),
    )
    assert out in (None, {})  # no crash, nothing clustered
