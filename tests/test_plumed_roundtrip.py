"""Cross-engine round trip with a REAL `plumed driver` binary.

Mirrors the reference's strongest validation
(/root/reference/deep_cartograph/tests/test_deep_cartograph.py:211-258):
train linear CVs, export the unbiased PLUMED inputs, run the actual PLUMED
binary on the trajectory, and compare PLUMED's CV values to the Python
projection at 1e-2.

Skipped when no PLUMED binary is available (this image ships none); set
PLUMED_BIN or put `plumed` on PATH to activate wherever PLUMED exists.
"""

import os
import zipfile
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from deep_cartograph_tpu.plumed.cli import (
    get_driver_command,
    plumed_available,
    run_plumed,
)

PLUMED_SETTINGS = {"bin_path": os.environ.get("PLUMED_BIN", "plumed")}

requires_plumed = pytest.mark.skipif(
    not plumed_available(PLUMED_SETTINGS),
    reason="no PLUMED binary on PATH (set PLUMED_BIN to enable)",
)


@requires_plumed
@pytest.mark.parametrize("cv", ["pca", "tica"])
def test_real_plumed_driver_matches_python_projection(cv, ca_system, tmp_path):
    from deep_cartograph_tpu.tools.compute_features import compute_features
    from deep_cartograph_tpu.tools.train_colvars import train_colvars

    features_cfg = {
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
                    }
                }
            },
        }
    }
    colvars = compute_features(
        configuration=features_cfg,
        trajectory_data=[ca_system.dcd_path],
        topology_data=[ca_system.pdb_path],
        output_folder=str(tmp_path / "features"),
    )
    out = str(tmp_path / "train")
    train_colvars(
        configuration={"cvs": [cv], "common": {"dimension": 2}},
        train_colvars_paths=colvars,
        train_topologies=[ca_system.pdb_path],
        trajectory_names=[Path(ca_system.dcd_path).stem],
        output_folder=out,
    )

    traj_name = Path(ca_system.dcd_path).stem
    traj_out = os.path.join(out, cv, "traj_data", traj_name)
    plumed_zip = os.path.join(
        traj_out, "plumed_inputs", f"plumed_{cv}_unbiased.zip"
    )
    assert os.path.isfile(plumed_zip)
    with zipfile.ZipFile(plumed_zip) as zf:
        zf.extractall(os.path.join(traj_out, "plumed_inputs"))
    plumed_input = os.path.join(
        traj_out, "plumed_inputs", f"plumed_input_{cv}.dat"
    )
    assert os.path.isfile(plumed_input)

    n_atoms = ca_system.coords.shape[1]
    cmd = get_driver_command(
        plumed_input, ca_system.dcd_path, n_atoms, traj_out
    )
    run_plumed(cmd, working_dir=traj_out, plumed_settings=PLUMED_SETTINGS)

    plumed_out = os.path.join(traj_out, f"{cv}_out.dat")
    assert os.path.isfile(plumed_out)
    from deep_cartograph_tpu.io.colvars import read_colvars

    plumed_proj = read_colvars(plumed_out).iloc[:, 1:3].to_numpy()
    python_proj = (
        pd.read_csv(os.path.join(traj_out, "projected_trajectory.csv"))
        .iloc[:, :2]
        .to_numpy()
    )
    assert np.abs(plumed_proj - python_proj).max() < 1e-2
