"""PLUMED export variants: bias methods, RMSD restraints, normalization
coupling in deep-CV exports."""

import os
import zipfile

import numpy as np
import pytest

from deep_cartograph_tpu.cv import cv_calculators_map
from deep_cartograph_tpu.io.colvars import write_colvars
from tests.fixtures import write_ca_pdb
from tests.test_cv import base_config


def _make_calc(cv_name, config, tmp_path, ca_system, rng):
    labels = ["dist-@CA_1-@CA_5", "dist-@CA_2-@CA_7", "dist-@CA_3-@CA_9"]
    data = rng.standard_normal((60, 3)).astype(np.float32) * 0.1 + 0.7
    colvars = str(tmp_path / "colvars.dat")
    t = np.arange(60, dtype=np.float32)
    write_colvars(colvars, np.column_stack([t, data]), ["time"] + labels)
    calc = cv_calculators_map[cv_name](
        configuration=config, output_path=str(tmp_path)
    )
    calc.load_training_data([colvars], [ca_system.pdb_path], features_list=labels)
    assert calc.run() is not None
    return calc, data


@pytest.mark.parametrize(
    "method,expect",
    [
        ("wt_metadynamics", "METAD"),
        ("opes_metad", "OPES_METAD"),
        ("opes_metad_explore", "OPES_METAD_EXPLORE"),
        ("opes_expanded", "OPES_EXPANDED"),
    ],
)
def test_bias_method_exports(method, expect, tmp_path, ca_system, rng):
    config = base_config()
    config["bias"]["method"] = method
    calc, _ = _make_calc("pca", config, tmp_path, ca_system, rng)
    out = tmp_path / "plumed"
    out.mkdir()
    calc.write_plumed_files(ca_system.pdb_path, str(out))
    with zipfile.ZipFile(out / "plumed_pca_biased.zip") as zf:
        input_name = [
            n for n in zf.namelist() if n.startswith(f"plumed_input_pca_{method}")
        ][0]
        text = zf.read(input_name).decode()
    assert expect in text
    if method == "wt_metadynamics":
        assert "BIASFACTOR" in text and "CALC_RCT" in text
    elif method == "opes_expanded":
        # umbrella-line expansion over the [-1,1]-normalized CV range
        assert "ECV_UMBRELLAS_LINE" in text
        assert "CV_MIN=-1" in text and "CV_MAX=1" in text
        assert "ARG=ecv_umb.*" in text
        assert "OBSERVATION_STEPS=" in text
    else:
        assert "BARRIER" in text and "COMPRESSION_THRESHOLD" in text


def test_waypoint_rmsd_restraint_export(tmp_path, ca_system, rng):
    config = base_config()
    config["bias"]["add_rmsd_restraint"] = True
    calc, _ = _make_calc("pca", config, tmp_path, ca_system, rng)

    wps = []
    for i, frame in enumerate((0, -1)):
        path = str(tmp_path / f"wp{i}.pdb")
        write_ca_pdb(path, ca_system.coords[frame])
        wps.append(path)

    out = tmp_path / "plumed"
    out.mkdir()
    calc.write_plumed_files(ca_system.pdb_path, str(out), waypoint_structures=wps)
    with zipfile.ZipFile(out / "plumed_pca_biased.zip") as zf:
        names = zf.namelist()
        assert "rmsd_restraint_reference.pdb" in names
        input_name = [
            n for n in names if n.startswith("plumed_input_pca_opes")
        ][0]
        text = zf.read(input_name).decode()
        ref_pdb = zf.read("rmsd_restraint_reference.pdb").decode()
    assert "RMSD REFERENCE=" in text
    assert "UPPER_WALLS" in text and "KAPPA=5000" in text
    # Stable CA atoms flagged with occupancy/B-factor 1.00
    assert " 1.00  1.00" in ref_pdb


def test_min_max_range1_decoder_coupling(tmp_path, ca_system, rng):
    """AE with min_max_range1 normalization must force a sigmoid decoder
    output and still export a TorchScript twin that matches."""
    import torch

    config = base_config()
    config["features_normalization"] = "min_max_range1"
    config["architecture"]["decoder"]["last_layer_activation"] = "tanh"  # wrong
    calc, data = _make_calc("ae", config, tmp_path, ca_system, rng)
    # coupling corrected the decoder activation
    assert calc.architecture["decoder_options"]["activation"][-1] == "custom_sigmoid"
    projection = calc.project_data(data)
    ts_path = str(tmp_path / "weights.pt")
    calc.save_weights(ts_path)
    ts = torch.jit.load(ts_path)
    with torch.no_grad():
        out = ts(torch.from_numpy(data)).numpy()
    np.testing.assert_allclose(out, projection, atol=1e-5)
