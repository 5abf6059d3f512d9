"""Golden-file regression tests (the reference's testing model, SURVEY §4):
deterministic fixtures -> committed expected outputs, compared with
tolerances (bitwise equality is meaningless across RNG/backends).

Regenerate goldens after intentional behavior changes with:
    python tests/test_golden.py --regenerate
"""

import os
import sys

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _fixture_system(tmp_dir):
    from tests.fixtures import make_ca_system

    return make_ca_system(tmp_dir, n_residues=12, n_frames=60, seed=7)


def _feature_labels():
    return [
        "dist-@CA_1-@CA_5",
        "dist-@CA_2-@CA_9",
        "dist-@CA_3-@CA_11",
        "dist-@CA_4-@CA_12",
        "sin-@CA_1-@CA_2-@CA_3-@CA_4",
        "cos-@CA_1-@CA_2-@CA_3-@CA_4",
        "sin-@CA_5-@CA_6-@CA_7-@CA_8",
        "cos-@CA_5-@CA_6-@CA_7-@CA_8",
    ]


def _compute_features_matrix(system):
    from deep_cartograph_tpu.geom.engine import Featurizer
    from deep_cartograph_tpu.io.topology import Topology

    top = Topology.from_pdb(system.pdb_path)
    return Featurizer(top, _feature_labels()).featurize_trajectory(
        system.dcd_path
    )


def _train_linear(cv_name, features, tmp_dir, system):
    from tests.test_cv import base_config
    from deep_cartograph_tpu.cv import cv_calculators_map
    from deep_cartograph_tpu.io.colvars import write_colvars

    os.makedirs(tmp_dir, exist_ok=True)
    colvars = os.path.join(tmp_dir, "colvars.dat")
    t = np.arange(features.shape[0], dtype=np.float32)
    write_colvars(
        colvars, np.column_stack([t, features]),
        ["time"] + _feature_labels(), fmt="%.6f",
    )
    calc = cv_calculators_map[cv_name](
        configuration=base_config(), output_path=tmp_dir
    )
    calc.load_training_data([colvars], [system.pdb_path],
                            features_list=_feature_labels())
    projection = calc.run()
    return projection.to_numpy()


def _generate(tmp_dir):
    system = _fixture_system(tmp_dir)
    features = _compute_features_matrix(system)
    out = {"features": features}
    for cv in ("pca", "tica", "htica", "ae", "deep_tica"):
        out[f"{cv}_projection"] = _train_linear(
            cv, features, os.path.join(tmp_dir, f"{cv}_run"), system
        )
    return out


def test_golden_features_and_linear_cvs(tmp_path):
    outputs = _generate(str(tmp_path))
    for name, arr in outputs.items():
        golden_path = os.path.join(GOLDEN_DIR, f"{name}.npy")
        assert os.path.exists(golden_path), (
            f"Missing golden file {golden_path}; run "
            "`python tests/test_golden.py --regenerate`"
        )
        expected = np.load(golden_path)
        assert arr.shape == expected.shape, name
        # 1e-4 tolerance per BASELINE.json / SURVEY §4
        np.testing.assert_allclose(arr, expected, atol=1e-4, err_msg=name)


if __name__ == "__main__":
    if "--regenerate" in sys.argv:
        import tempfile

        os.makedirs(GOLDEN_DIR, exist_ok=True)
        with tempfile.TemporaryDirectory() as td:
            outputs = _generate(td)
        for name, arr in outputs.items():
            np.save(os.path.join(GOLDEN_DIR, f"{name}.npy"), arr)
            print(f"wrote {name}: {arr.shape}")
