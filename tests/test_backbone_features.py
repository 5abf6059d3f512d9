"""All-atom feature paths: protein-backbone phi/psi shortcuts, real-dihedral
search over guessed bonds, coordinate features with fit-to-template, and
distance-to-center groups — end to end through compute_features."""

import os

import numpy as np
import pytest

from deep_cartograph_tpu.features.discovery import (
    find_dihedrals,
    get_features_list,
)
from deep_cartograph_tpu.features.grammar import compile_plan
from deep_cartograph_tpu.geom.kernels import PlanEvaluator
from deep_cartograph_tpu.io.dcd import write_dcd
from deep_cartograph_tpu.io.topology import Topology
from tests.test_features import numpy_dihedral


@pytest.fixture(scope="module")
def backbone_system(tmp_path_factory):
    """A 4-residue peptide backbone (N, CA, C per residue) with real
    geometry-ish spacing so bond guessing (<2 A) works."""
    root = tmp_path_factory.mktemp("backbone")
    rng = np.random.default_rng(5)
    n_res = 4
    names, resnames, resids, base = [], [], [], []
    x = 0.0
    for r in range(1, n_res + 1):
        for name, dx in (("N", 1.33), ("CA", 1.46), ("C", 1.52)):
            x += dx
            names.append(name)
            resnames.append("ALA")
            resids.append(r)
            # slight zig-zag off the x axis keeps dihedrals well-defined
            base.append((x, 0.6 * ((len(base) % 2) * 2 - 1), 0.1 * len(base)))
    base = np.asarray(base, np.float32)

    pdb_path = os.path.join(str(root), "backbone.pdb")
    with open(pdb_path, "w") as fh:
        for i in range(len(names)):
            nm = names[i]
            fh.write(
                f"ATOM  {i + 1:>5}  {nm:<3} {resnames[i]:<4}A{resids[i]:>4}    "
                f"{base[i, 0]:8.3f}{base[i, 1]:8.3f}{base[i, 2]:8.3f}"
                f"{1.0:6.2f}{0.0:6.2f}           {nm[0]}\n"
            )
        fh.write("END\n")

    n_frames = 20
    coords = np.repeat(base[None], n_frames, axis=0)
    coords += 0.05 * rng.standard_normal(coords.shape).astype(np.float32)
    dcd_path = os.path.join(str(root), "backbone.dcd")
    write_dcd(dcd_path, coords)
    return pdb_path, dcd_path, coords


def test_protein_backbone_discovery(backbone_system):
    pdb_path, _, _ = backbone_system
    top = Topology.from_pdb(pdb_path)
    labels = find_dihedrals(top, "all", "protein_backbone")
    # phi needs previous residue, psi needs next: residues 2..4 have phi,
    # residues 1..3 have psi
    assert "@phi_2" in labels and "@phi_4" in labels
    assert "@phi_1" not in labels
    assert "@psi_1" in labels and "@psi_3" in labels
    assert "@psi_4" not in labels


def test_phi_psi_evaluation_matches_numpy(backbone_system):
    pdb_path, _, coords = backbone_system
    top = Topology.from_pdb(pdb_path)
    plan = compile_plan(["tor-@phi_2", "tor-@psi_2"], top)
    feats = PlanEvaluator(plan)(coords)

    # phi(2) = C(1), N(2), CA(2), C(2); psi(2) = N(2), CA(2), C(2), N(3)
    idx = {
        (n, r): top.atom_index(n, r)
        for n, r in (("C", 1), ("N", 2), ("CA", 2), ("C", 2), ("N", 3))
    }
    for f in (0, 7, 19):
        phi = numpy_dihedral(
            coords[f, idx[("C", 1)]], coords[f, idx[("N", 2)]],
            coords[f, idx[("CA", 2)]], coords[f, idx[("C", 2)]],
        )
        psi = numpy_dihedral(
            coords[f, idx[("N", 2)]], coords[f, idx[("CA", 2)]],
            coords[f, idx[("C", 2)]], coords[f, idx[("N", 3)]],
        )
        np.testing.assert_allclose(feats[f, 0], phi, atol=1e-4)
        np.testing.assert_allclose(feats[f, 1], psi, atol=1e-4)


def test_real_dihedral_search_with_guessed_bonds(backbone_system):
    pdb_path, _, _ = backbone_system
    top = Topology.from_pdb(pdb_path)
    labels = find_dihedrals(top, "all", "real")
    # chain of 12 bonded atoms -> 9 consecutive quadruples
    assert len(labels) == 9
    assert labels[0].count("-") == 3
    # every quadruple references bonded neighbors (consecutive chain atoms)
    for label in labels:
        entities = label.split("-")
        idxs = [top.atom_index(e.split("_")[0][1:], int(e.split("_")[1]))
                for e in entities]
        assert sorted(idxs) == list(range(min(idxs), min(idxs) + 4))


def test_compute_features_with_coords_and_centers(backbone_system, tmp_path):
    """compute_features end to end with coordinate features (fit template)
    and distance-to-center groups."""
    from deep_cartograph_tpu.io.colvars import read_colvars
    from deep_cartograph_tpu.tools.compute_features import compute_features

    pdb_path, dcd_path, coords = backbone_system
    config = {
        "plumed_settings": {
            "features": {
                "coordinate_groups": {
                    "ca_pos": {"selection": "name CA", "stride": 1}
                },
                "distance_to_center_groups": {
                    "to_center": {
                        "selection": "name CA",
                        "center_selection": "name CA",
                    }
                },
            }
        }
    }
    out = str(tmp_path / "cf")
    colvars_paths = compute_features(
        configuration=config,
        trajectory_data=[dcd_path],
        topology_data=[pdb_path],
        output_folder=out,
    )
    df = read_colvars(colvars_paths[0])
    coord_cols = [c for c in df.columns if c.startswith("coord-")]
    center_cols = [c for c in df.columns if "center_" in c]
    assert len(coord_cols) == 4 * 3  # 4 CA atoms x 3 axes
    assert len(center_cols) == 4
    assert np.isfinite(df.to_numpy()).all()
    # fit template was generated for the coordinate features
    assert os.path.exists(os.path.join(out, "backbone", "fit_template.pdb"))

    # distance-to-center semantics: compare one column against numpy
    top = Topology.from_pdb(pdb_path)
    ca_idx = top.select("name CA")
    center = coords[:, ca_idx].mean(axis=1)
    d0 = np.linalg.norm(coords[:, ca_idx[0]] - center, axis=-1) * 0.1
    np.testing.assert_allclose(
        df[center_cols[0]].to_numpy(), d0, atol=2e-4
    )
