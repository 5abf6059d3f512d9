"""CLI surface smoke tests: per-tool entry points parse flags and run."""

import os
import sys

import numpy as np
import pytest
import yaml


def _run_main(main_fn, argv, monkeypatch):
    monkeypatch.setattr(sys, "argv", ["prog"] + argv)
    main_fn()


def test_compute_features_cli(ca_system, tmp_path, monkeypatch):
    from deep_cartograph_tpu.tool_cli import compute_features_main

    config = {
        "plumed_settings": {
            "features": {
                "distance_groups": {
                    "ca": {
                        "first_selection": "name CA",
                        "second_selection": "name CA",
                        "first_stride": 1,
                        "second_stride": 3,
                        "skip_neigh_residues": True,
                        "skip_bonded_atoms": False,
                    }
                }
            }
        }
    }
    conf_path = str(tmp_path / "conf.yml")
    with open(conf_path, "w") as fh:
        yaml.dump(config, fh)
    out = str(tmp_path / "cf_out")
    _run_main(
        compute_features_main,
        [
            "-conf", conf_path,
            "-traj_data", ca_system.dcd_path,
            "-top_data", ca_system.pdb_path,
            "-output", out,
        ],
        monkeypatch,
    )
    assert os.path.exists(os.path.join(out, "ca_example", "colvars.dat"))


def test_filter_features_cli(ca_system, tmp_path, monkeypatch, rng):
    from deep_cartograph_tpu.io.colvars import write_colvars
    from deep_cartograph_tpu.tool_cli import filter_features_main

    labels = ["dist-@CA_1-@CA_5", "dist-@CA_2-@CA_7"]
    data = rng.standard_normal((60, 2)).astype(np.float32)
    colvars = str(tmp_path / "colvars.dat")
    t = np.arange(60, dtype=np.float32)
    write_colvars(colvars, np.column_stack([t, data]), ["time"] + labels)

    conf_path = str(tmp_path / "conf.yml")
    with open(conf_path, "w") as fh:
        yaml.dump(
            {"filter_settings": {"diptest_significance_level": None,
                                 "std_quantile": 0.0}}, fh
        )
    out = str(tmp_path / "ff_out")
    _run_main(
        filter_features_main,
        ["-conf", conf_path, "-colvars", colvars, "-output", out],
        monkeypatch,
    )
    assert os.path.exists(os.path.join(out, "filtered_features.txt"))


def test_align_trajectories_cli(ca_system, tmp_path, monkeypatch):
    from deep_cartograph_tpu.tool_cli import align_trajectories_main

    out = str(tmp_path / "align_out")
    _run_main(
        align_trajectories_main,
        [
            "-traj_data", ca_system.dcd_path,
            "-top_data", ca_system.pdb_path,
            "-output", out,
        ],
        monkeypatch,
    )
    assert os.path.exists(os.path.join(out, "ca_example.dcd"))


def test_main_cli_help(monkeypatch, capsys):
    from deep_cartograph_tpu.cli import parse_arguments

    monkeypatch.setattr(sys, "argv", ["deep_carto", "-h"])
    with pytest.raises(SystemExit):
        parse_arguments()
    help_text = capsys.readouterr().out
    # flag-compatibility surface with the reference CLI
    for flag in ("-traj_data", "-top_data", "-ref_top", "-waypoints_data",
                 "-restart", "-dim", "-cvs", "-out"):
        assert flag in help_text
