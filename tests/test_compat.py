"""Compatibility tests: reference-layout model zips and the traj_projection
workflow (the reference's checkpoint/restore round-trip, cf.
tests/test_traj_projection.py in the reference)."""

import json
import os
import zipfile

import numpy as np
import pytest

from deep_cartograph_tpu.cv.base import CVCalculator
from deep_cartograph_tpu.io.colvars import write_colvars


@pytest.fixture()
def colvars_file(tmp_path, ca_system, rng):
    labels = ["dist-@CA_1-@CA_5", "dist-@CA_2-@CA_7", "dist-@CA_3-@CA_9"]
    data = rng.standard_normal((50, 3)).astype(np.float32) * 0.2 + 0.8
    path = str(tmp_path / "colvars.dat")
    time_col = np.arange(50, dtype=np.float32)
    write_colvars(path, np.column_stack([time_col, data]), ["time"] + labels)
    return path, labels, data


def _make_reference_style_linear_zip(tmp_path, ca_system, labels):
    """Model zip with exactly the reference's linear layout
    (cv_calculator.py:853-892): metadata.json, features_labels.txt,
    ref_topology.pdb, cv_weights.npy, cv/features norm params."""
    model_dir = tmp_path / "model"
    model_dir.mkdir()
    n = len(labels)
    weights = np.asarray([[1.0, 0.0], [0.0, 1.0], [0.5, -0.5]], np.float64)
    with open(model_dir / "metadata.json", "w") as fh:
        json.dump({"cv_name": "pca", "cv_dimension": 2}, fh)
    with open(model_dir / "features_labels.txt", "w") as fh:
        fh.write("\n".join(labels) + "\n")
    import shutil

    shutil.copy(ca_system.pdb_path, model_dir / "ref_topology.pdb")
    np.save(model_dir / "cv_weights.npy", weights)
    np.save(model_dir / "cv_norm_mean.npy", np.zeros(2))
    np.save(model_dir / "cv_norm_range.npy", np.ones(2))
    np.save(model_dir / "features_norm_mean.npy", np.zeros(n))
    np.save(model_dir / "features_norm_range.npy", np.ones(n))

    zip_path = str(tmp_path / "ref_model.zip")
    with zipfile.ZipFile(zip_path, "w") as zf:
        for f in model_dir.iterdir():
            zf.write(f, arcname=f"model/{f.name}")
    return zip_path, weights


def test_load_reference_style_linear_zip(tmp_path, ca_system, colvars_file):
    colvars_path, labels, data = colvars_file
    zip_path, weights = _make_reference_style_linear_zip(
        tmp_path, ca_system, labels
    )
    calc = CVCalculator.load(zip_path, str(tmp_path / "out"))
    assert calc.cv_name == "pca"
    assert calc.features_ref_labels == labels
    projected = calc.project_colvars([colvars_path], [ca_system.pdb_path])
    expected = data @ weights
    np.testing.assert_allclose(projected.to_numpy(), expected, atol=2e-4)


def test_load_torchscript_only_deep_zip(tmp_path, ca_system, colvars_file):
    """Zips holding only TorchScript weights (as produced by the reference's
    deep calculators) load through the torch fallback projector."""
    import torch

    colvars_path, labels, data = colvars_file
    model_dir = tmp_path / "tmodel"
    model_dir.mkdir()

    class TinyCV(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.linear = torch.nn.Linear(3, 2)
            with torch.no_grad():
                self.linear.weight.copy_(
                    torch.tensor([[1.0, 0.0, 0.5], [0.0, 1.0, -0.5]])
                )
                self.linear.bias.zero_()

        def forward(self, x):
            return torch.tanh(self.linear(x))

    traced = torch.jit.trace(TinyCV().eval(), torch.zeros(1, 3))
    traced.save(str(model_dir / "cv_weights.pt"))
    with open(model_dir / "metadata.json", "w") as fh:
        json.dump({"cv_name": "ae", "cv_dimension": 2}, fh)
    with open(model_dir / "features_labels.txt", "w") as fh:
        fh.write("\n".join(labels) + "\n")
    import shutil

    shutil.copy(ca_system.pdb_path, model_dir / "ref_topology.pdb")
    zip_path = str(tmp_path / "ts_model.zip")
    with zipfile.ZipFile(zip_path, "w") as zf:
        for f in model_dir.iterdir():
            zf.write(f, arcname=f"model/{f.name}")

    calc = CVCalculator.load(zip_path, str(tmp_path / "out2"))
    projected = calc.project_colvars([colvars_path], [ca_system.pdb_path])
    expected = np.tanh(
        data @ np.array([[1.0, 0.0], [0.0, 1.0], [0.5, -0.5]], np.float32)
    )
    np.testing.assert_allclose(projected.to_numpy(), expected, atol=2e-4)


def test_traj_projection_workflow(tmp_path, ca_system, colvars_file):
    """Full traj_projection tool over a saved model (restore round-trip)."""
    from deep_cartograph_tpu.tools.traj_projection import traj_projection

    colvars_path, labels, data = colvars_file
    zip_path, weights = _make_reference_style_linear_zip(
        tmp_path, ca_system, labels
    )
    out = str(tmp_path / "proj")
    result = traj_projection(
        configuration={},
        colvars_paths=[colvars_path],
        topologies=[ca_system.pdb_path],
        model_paths=[zip_path],
        trajectory_names=["mytraj"],
        output_folder=out,
    )
    proj_csv = os.path.join(out, "pca", "mytraj", "projected_trajectory.csv")
    assert os.path.exists(proj_csv)
    assert result["pca"]["traj_paths"] == [proj_csv]
    import pandas as pd

    df = pd.read_csv(proj_csv)
    np.testing.assert_allclose(
        df.to_numpy(), data @ weights, atol=1e-3
    )
    # Re-run: restart skip
    result2 = traj_projection(
        configuration={},
        colvars_paths=[colvars_path],
        topologies=[ca_system.pdb_path],
        model_paths=[zip_path],
        trajectory_names=["mytraj"],
        output_folder=out,
    )
    assert result2["pca"]["traj_paths"] == [proj_csv]


def test_reference_import_paths_drop_in():
    """The reference's real import statements (taken from its tests and
    notebooks) resolve against the compat package and point at the
    TPU-native implementations."""
    from deep_cartograph.deep_carto import deep_cartograph
    from deep_cartograph.tools import (
        compute_features,
        filter_features,
        train_colvars,
        traj_augmentation,
        traj_cluster,
        traj_projection,
    )
    from deep_cartograph.tools.compute_features import (
        compute_features as cf2,
    )
    from deep_cartograph.modules.common import read_features_list
    from deep_cartograph.modules.plumed.colvars import read_colvars
    from deep_cartograph.modules.md import RMSD, get_features_list
    from deep_cartograph.modules.bio import PDBTopologyMapper
    from deep_cartograph.modules.statistics import optimize_clustering
    from deep_cartograph.modules.figures import figures
    from deep_cartograph.modules.cv_learning.cv_calculator import CVCalculator

    import importlib

    ours = importlib.import_module("deep_cartograph_tpu.tools.compute_features")
    assert cf2 is ours.compute_features
    assert compute_features is ours.compute_features
    assert hasattr(figures, "plot_fes") or hasattr(figures, "plot_data")
    assert callable(deep_cartograph) and callable(optimize_clustering)
    assert callable(read_features_list) and callable(read_colvars)
    assert callable(RMSD) and callable(get_features_list)
    assert PDBTopologyMapper is not None and CVCalculator is not None


def test_data_package_drop_in(tmp_path):
    """`from deep_cartograph import data` works like the reference's bundled
    data package: same dataset directories/naming, generated on import
    (deep_cartograph_tpu/utils/demo_data.py) instead of committed binaries."""
    import importlib.resources as resources

    from deep_cartograph import data

    folder = str(resources.files(data))
    for name in data.DATASETS:
        assert os.path.isdir(os.path.join(folder, name)), name

    # reference-style path resolution into a dataset
    traj = os.path.join(folder, "peptide_ensemble", "input", "peptide1",
                        "peptide1.xtc")
    top = os.path.join(folder, "peptide_ensemble", "input", "peptide1",
                       "peptide1.pdb")
    assert os.path.exists(traj) and os.path.exists(top)

    # the generated trajectory actually featurizes end-to-end
    from deep_cartograph_tpu.tools.compute_features import compute_features

    out = compute_features(
        configuration={
            "plumed_settings": {
                "traj_stride": 1,
                "features": {
                    "distance_groups": {
                        "d": {
                            "first_selection": "name CA",
                            "second_selection": "name CA",
                            "first_stride": 1,
                            "second_stride": 1,
                            "skip_neigh_residues": True,
                            "skip_bonded_atoms": False,
                        }
                    }
                },
            }
        },
        trajectory_data=[traj],
        topology_data=[top],
        output_folder=str(tmp_path / "cf"),
    )
    assert len(out) == 1 and os.path.exists(out[0])

    # muller_brown colvars parse as PLUMED text
    from deep_cartograph_tpu.io.colvars import read_colvars

    df = read_colvars(os.path.join(folder, "muller_brown", "px_py.dat"))
    assert list(df.columns)[:3] == ["time", "p.x", "p.y"]
    assert len(df) == 4000


def test_calpha_transitions_matches_reference_listing():
    """The generated calpha_transitions dataset ships every transition
    system and config the reference dataset does (reference
    data/calpha_transitions/input/), and the validation configs validate
    against the composite schema."""
    import importlib

    import yaml

    from deep_cartograph_tpu.config.schemas import DeepCartograph
    from deep_cartograph_tpu.utils.demo_data import CALPHA_SYSTEMS

    data = importlib.import_module("deep_cartograph.data")
    inp = os.path.join(data._ROOT, "calpha_transitions", "input")
    assert len(CALPHA_SYSTEMS) == 6
    for name, (prefix, _, _) in CALPHA_SYSTEMS.items():
        stem = prefix or name
        for ext in (".pdb", ".dcd"):
            assert os.path.exists(os.path.join(inp, name, stem + ext)), (
                f"missing {name}/{stem}{ext}"
            )
    for cfg in (
        "distances_config.yml",
        "torsions_config.yml",
        "distances_config_validation.yml",
        "torsions_config_validation.yml",
    ):
        path = os.path.join(inp, cfg)
        assert os.path.exists(path), f"missing {cfg}"
        with open(path) as fh:
            DeepCartograph(**yaml.safe_load(fh))
    assert os.path.exists(
        os.path.join(
            data._ROOT, "calpha_transitions", "experiments",
            "torsions_config.yml",
        )
    )


def test_data_dir_override_and_regenerate(tmp_path, monkeypatch):
    """DEEP_CARTO_DATA_DIR points dataset generation at a writable location
    (read-only installs); materialize() is idempotent via markers."""
    import importlib
    import sys

    from deep_cartograph_tpu.utils.demo_data import DATASETS, materialize

    target = str(tmp_path / "data_override")
    materialize(target)
    marker = os.path.join(target, "muller_brown", ".generated")
    assert os.path.exists(marker)
    before = os.path.getmtime(marker)
    materialize(target)  # second call: skipped, marker untouched
    assert os.path.getmtime(marker) == before

    # A stale marker (older generator version) triggers regeneration.
    with open(marker, "w") as fh:
        fh.write("generated by deep_cartograph_tpu.utils.demo_data\n")
    materialize(target)
    with open(marker) as fh:
        assert "v1" in fh.read()

    monkeypatch.setenv("DEEP_CARTO_DATA_DIR", str(tmp_path / "env_dir"))
    sys.modules.pop("deep_cartograph.data", None)
    mod = importlib.import_module("deep_cartograph.data")
    assert mod._ROOT == str(tmp_path / "env_dir")
    for name in DATASETS:
        assert os.path.isdir(os.path.join(mod._ROOT, name))
    sys.modules.pop("deep_cartograph.data", None)  # leave clean for others


REFERENCE_ROOT = "/root/reference/deep_cartograph"


@pytest.mark.skipif(not os.path.isdir(REFERENCE_ROOT),
                    reason="reference checkout not mounted")
@pytest.mark.parametrize("rel, modname", [
    ("modules/md/md.py", "deep_cartograph.modules.md"),
    ("modules/common/common.py", "deep_cartograph.modules.common"),
    ("modules/statistics/statistics.py", "deep_cartograph.modules.statistics"),
    ("modules/figures/figures.py", "deep_cartograph.modules.figures"),
    ("modules/bio/bio.py", "deep_cartograph.modules.bio"),
    ("modules/plumed/colvars.py", "deep_cartograph.modules.plumed.colvars"),
    ("modules/plumed/command.py", "deep_cartograph.modules.plumed.command"),
    ("modules/plumed/cli.py", "deep_cartograph.modules.plumed.cli"),
    ("modules/plumed/utils.py", "deep_cartograph.modules.plumed.utils"),
    ("modules/plumed/input/assembler.py",
     "deep_cartograph.modules.plumed.input.assembler"),
    ("modules/plumed/input/builder.py",
     "deep_cartograph.modules.plumed.input.builder"),
    ("modules/features/common.py", "deep_cartograph.modules.features.common"),
    ("modules/features/filter.py", "deep_cartograph.modules.features.filter"),
    ("modules/features/translator.py",
     "deep_cartograph.modules.features.translator"),
    ("modules/ml/ml.py", "deep_cartograph.modules.ml.ml"),
    ("modules/cv_learning/cv_calculator.py",
     "deep_cartograph.modules.cv_learning"),
    ("yaml_schemas/analyze_geometry.py",
     "deep_cartograph.yaml_schemas.analyze_geometry"),
    ("yaml_schemas/compute_features.py",
     "deep_cartograph.yaml_schemas.compute_features"),
    ("yaml_schemas/deep_cartograph.py",
     "deep_cartograph.yaml_schemas.deep_cartograph"),
    ("yaml_schemas/filter_features.py",
     "deep_cartograph.yaml_schemas.filter_features"),
    ("yaml_schemas/train_colvars.py",
     "deep_cartograph.yaml_schemas.train_colvars"),
    ("yaml_schemas/traj_augmentation.py",
     "deep_cartograph.yaml_schemas.traj_augmentation"),
    ("yaml_schemas/traj_cluster.py",
     "deep_cartograph.yaml_schemas.traj_cluster"),
    ("yaml_schemas/traj_projection.py",
     "deep_cartograph.yaml_schemas.traj_projection"),
    ("deep_carto.py", "deep_cartograph.deep_carto"),
])
def test_compat_surface_covers_reference_module(rel, modname):
    """Every PUBLIC function/class of the reference module exists on the
    drop-in compat module (automated version of the API-parity audit)."""
    import ast
    import importlib
    import warnings

    src = os.path.join(REFERENCE_ROOT, rel)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", SyntaxWarning)
        tree = ast.parse(open(src).read())
    public = [
        n.name
        for n in tree.body
        if isinstance(n, (ast.FunctionDef, ast.ClassDef))
        and not n.name.startswith("_")
    ]
    mod = importlib.import_module(modname)
    missing = [p for p in public if not hasattr(mod, p)]
    assert not missing, f"{modname} missing reference API: {missing}"


TOOL_NAMES = [
    "analyze_geometry",
    "traj_augmentation",
    "compute_features",
    "filter_features",
    "train_colvars",
    "traj_projection",
    "traj_cluster",
    "align_trajectories",
]


@pytest.mark.skipif(not os.path.isdir(REFERENCE_ROOT),
                    reason="reference checkout not mounted")
@pytest.mark.parametrize("tool", TOOL_NAMES)
def test_tool_signature_superset(tool):
    """Each compat tool entry accepts every parameter of the reference's
    tool entry (by name), and every reference-optional parameter stays
    optional — so reference call sites keep working verbatim."""
    import importlib
    import inspect

    ref_ns: dict = {}
    src = os.path.join(REFERENCE_ROOT, "tools", tool, f"{tool}.py")
    # Parse rather than import: the reference module needs PLUMED/mlcolvar.
    import ast

    tree = ast.parse(open(src).read())
    fn = next(
        n for n in tree.body
        if isinstance(n, ast.FunctionDef) and n.name == tool
    )
    ref_params = [a.arg for a in fn.args.args]
    n_defaults = len(fn.args.defaults)
    ref_optional = set(ref_params[-n_defaults:]) if n_defaults else set()

    import types

    ours = getattr(importlib.import_module("deep_cartograph.tools"), tool)
    if isinstance(ours, types.ModuleType):
        # An earlier import of the submodule shadows the function attribute
        # on the package (standard Python behavior); resolve the function.
        ours = getattr(ours, tool)
    sig = inspect.signature(ours)
    have = set(sig.parameters)
    accepts_kwargs = any(
        p.kind is inspect.Parameter.VAR_KEYWORD
        for p in sig.parameters.values()
    )
    missing = [p for p in ref_params if p not in have]
    assert accepts_kwargs or not missing, (
        f"{tool} missing reference parameters: {missing}"
    )
    non_optional = [
        p for p in ref_optional
        if p in sig.parameters
        and sig.parameters[p].default is inspect.Parameter.empty
    ]
    assert not non_optional, (
        f"{tool}: reference-optional params are required here: {non_optional}"
    )
