"""Cross-framework parity against the reference's own test artifacts.

Projects the reference's committed colvars through the reference's committed
pretrained model zips (all 6 CV types, including the TorchScript-only deep
models) using THIS framework's traj_projection, and compares against the
reference's committed projected CSVs (cf. reference
tests/test_traj_projection.py:15-79, which asserts exact CSV equality).

Skipped when the reference checkout is not mounted.
"""

import glob
import os

import numpy as np
import pandas as pd
import pytest

_DATA = "/root/reference/deep_cartograph/tests/data"


@pytest.mark.skipif(
    not os.path.isdir(_DATA), reason="reference checkout not available"
)
def test_projection_matches_reference_csvs(tmp_path):
    from deep_cartograph_tpu.tools.traj_projection import traj_projection

    models = sorted(glob.glob(os.path.join(_DATA, "input/models/*.zip")))
    assert len(models) == 6
    out = traj_projection(
        configuration={},
        colvars_paths=[
            os.path.join(_DATA, "reference/compute_features/virtual_dihedrals.dat")
        ],
        topologies=[os.path.join(_DATA, "input/topology/CA_example.pdb")],
        trajectory_names=["CA_example"],
        model_paths=models,
        output_folder=str(tmp_path),
    )

    assert set(out) == {"pca", "tica", "htica", "ae", "vae", "deep_tica"}
    for cv, info in out.items():
        ours = pd.read_csv(info["traj_paths"][0]).to_numpy()
        ref = pd.read_csv(
            os.path.join(
                _DATA, "reference/train_colvars",
                f"{cv}_projected_trajectory.csv",
            )
        ).to_numpy()
        # The reference's own regression asserts exact equality of these CSVs;
        # we reproduce them to their full written precision (1e-4 contract).
        np.testing.assert_allclose(ours, ref, atol=1e-4, err_msg=cv)


@pytest.mark.skipif(
    not os.path.isdir(_DATA), reason="reference checkout not available"
)
@pytest.mark.parametrize(
    "name,cfg",
    [
        (
            "virtual_dihedrals",
            {"plumed_settings": {"traj_stride": 1, "features": {
                "dihedral_groups": {"tor": {
                    "selection": "all", "periodic_encoding": True,
                    "search_mode": "virtual"}}}}},
        ),
        (
            "distances",
            {"plumed_settings": {"traj_stride": 1, "features": {
                "distance_groups": {"dist": {
                    "first_selection": "all", "second_selection": "all",
                    "first_stride": 1, "second_stride": 10,
                    "skip_neigh_residues": False,
                    "skip_bonded_atoms": True}}}}},
        ),
    ],
)
def test_featurization_matches_plumed_ground_truth(tmp_path, name, cfg):
    """Our featurizer vs colvars produced by the actual PLUMED driver
    (the reference's committed compute_features outputs; cf. reference
    tests/test_compute_features.py:44-137): identical feature discovery
    (same columns, same order) and values equal to the files' precision."""
    from deep_cartograph_tpu.io.colvars import read_colvars
    from deep_cartograph_tpu.tools.compute_features import compute_features

    paths = compute_features(
        configuration=cfg,
        trajectory_data=[os.path.join(_DATA, "input/trajectory/CA_example.dcd")],
        topology_data=[os.path.join(_DATA, "input/topology/CA_example.pdb")],
        output_folder=str(tmp_path),
    )
    ours = read_colvars(paths[0])
    ref = read_colvars(
        os.path.join(_DATA, "reference/compute_features", f"{name}.dat")
    )
    assert list(ours.columns) == list(ref.columns)
    np.testing.assert_allclose(
        ours.to_numpy(), ref.to_numpy(), atol=1.1e-4, err_msg=name
    )
