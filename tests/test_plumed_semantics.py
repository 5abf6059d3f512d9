"""Semantic validation of exported PLUMED inputs.

The reference validates exported linear CVs by running the real `plumed
driver` and comparing against the Python projection (its
test_deep_cartograph.py cross-engine check). No PLUMED binary exists here,
so this test interprets the generated PLUMED input itself: it parses the
DISTANCE/TORSION/CUSTOM/COMBINE action chain and evaluates it with numpy on
the trajectory, asserting the result matches the calculator's projection —
i.e. the exported artifact is semantically correct, not just well-formed.
"""

import os
import re
import zipfile

import numpy as np
import pytest

from deep_cartograph_tpu.io.topology import Topology


def evaluate_plumed_input(text: str, coords: np.ndarray, topology: Topology):
    """Tiny PLUMED interpreter for the action subset our exports use."""
    values = {}

    def atom_index(token: str) -> int:
        # '@CA-5' (entity with '_'->'-') or plain 1-based integer
        if token.startswith("@"):
            name, resid = token[1:].rsplit("-", 1)
            return topology.atom_index(name, int(resid))
        return int(token) - 1

    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        if ":" not in line:
            continue
        label, rest = line.split(":", 1)
        label = label.strip()
        rest = rest.strip()
        action = rest.split()[0]
        kv = dict(
            (m.group(1), m.group(2))
            for m in re.finditer(r"(\w+)=([^\s]+)", rest)
        )
        if action == "DISTANCE":
            atoms = [atom_index(a) for a in kv["ATOMS"].split(",")]
            diff = coords[:, atoms[0]] - coords[:, atoms[1]]
            values[label] = np.sqrt((diff**2).sum(-1)) * 0.1  # nm
        elif action == "TORSION":
            a = [atom_index(x) for x in kv["ATOMS"].split(",")]
            p0, p1, p2, p3 = (coords[:, i] for i in a)
            b0, b1, b2 = p0 - p1, p2 - p1, p3 - p2
            b1n = b1 / np.linalg.norm(b1, axis=-1, keepdims=True)
            v = b0 - (b0 * b1n).sum(-1, keepdims=True) * b1n
            w = b2 - (b2 * b1n).sum(-1, keepdims=True) * b1n
            x = (v * w).sum(-1)
            y = (np.cross(b1n, v) * w).sum(-1)
            values[label] = np.arctan2(y, x)
        elif action == "CUSTOM":
            arg = kv["ARG"]
            func = kv["FUNC"]
            x = values[arg]
            if func == "sin(x)":
                values[label] = np.sin(x)
            elif func == "cos(x)":
                values[label] = np.cos(x)
            else:
                raise ValueError(f"Unsupported CUSTOM FUNC {func}")
        elif action == "COMBINE":
            args = [values[a] for a in kv["ARG"].split(",")]
            coeffs = (
                [float(c) for c in kv["COEFFICIENTS"].split(",")]
                if "COEFFICIENTS" in kv
                else [1.0] * len(args)
            )
            params = (
                [float(p) for p in kv["PARAMETERS"].split(",")]
                if "PARAMETERS" in kv
                else [0.0] * len(args)
            )
            acc = np.zeros(coords.shape[0])
            for a, c, p in zip(args, coeffs, params):
                acc = acc + c * (a - p)
            values[label] = acc
    return values


@pytest.mark.parametrize("cv_name", ["pca", "tica"])
def test_exported_linear_cv_matches_projection(cv_name, tmp_path, ca_system):
    from tests.test_cv import base_config
    from deep_cartograph_tpu.cv import cv_calculators_map
    from deep_cartograph_tpu.io.colvars import write_colvars
    from deep_cartograph_tpu.geom.engine import Featurizer

    topology = Topology.from_pdb(ca_system.pdb_path)
    labels = [
        "dist-@CA_1-@CA_5",
        "dist-@CA_2-@CA_9",
        "dist-@CA_3-@CA_11",
        "sin-@CA_1-@CA_2-@CA_3-@CA_4",
        "cos-@CA_1-@CA_2-@CA_3-@CA_4",
    ]
    features = Featurizer(topology, labels).featurize_trajectory(
        ca_system.dcd_path
    )
    colvars_path = str(tmp_path / "colvars.dat")
    time_col = np.arange(features.shape[0], dtype=np.float32)
    write_colvars(
        colvars_path,
        np.column_stack([time_col, features]),
        ["time"] + labels,
        fmt="%.6f",
    )

    calc = cv_calculators_map[cv_name](
        configuration=base_config(), output_path=str(tmp_path)
    )
    calc.load_training_data(
        [colvars_path], [ca_system.pdb_path], features_list=labels
    )
    projection = calc.run()
    assert projection is not None

    plumed_dir = tmp_path / "plumed"
    plumed_dir.mkdir()
    calc.write_plumed_files(ca_system.pdb_path, str(plumed_dir))
    with zipfile.ZipFile(plumed_dir / f"plumed_{cv_name}_unbiased.zip") as zf:
        input_name = [n for n in zf.namelist() if n.startswith("plumed_input")][0]
        text = zf.read(input_name).decode()

    values = evaluate_plumed_input(text, ca_system.coords, topology)
    # The final normalized CV labels (norm_<cv>_<i>) must equal the
    # calculator's projection of the same trajectory.
    for i in range(2):
        plumed_cv = values[f"norm_{cv_name}_{i}"]
        np.testing.assert_allclose(
            plumed_cv, projection.to_numpy()[:, i], atol=1e-2
        )
