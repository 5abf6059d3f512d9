"""utils/common helper semantics (reference common.py parity)."""

import os

from deep_cartograph_tpu.utils.common import (
    closest_power_of_two,
    get_unique_path,
    merge_configurations,
    read_features_list,
)


def test_merge_configurations_recursive_override():
    common = {
        "dimension": 2,
        "training": {"general": {"seed": 42, "max_epochs": 100},
                     "optimizer": {"name": "Adam"}},
    }
    specific = {"training": {"general": {"max_epochs": 5}}, "lag_time": 3}
    merged = merge_configurations(common, specific)
    assert merged["training"]["general"] == {"seed": 42, "max_epochs": 5}
    assert merged["training"]["optimizer"] == {"name": "Adam"}
    assert merged["dimension"] == 2 and merged["lag_time"] == 3
    # inputs untouched
    assert common["training"]["general"]["max_epochs"] == 100


def test_get_unique_path_files_and_dirs(tmp_path):
    f = tmp_path / "out.txt"
    assert get_unique_path(str(f)) == str(f)
    f.write_text("x")
    assert get_unique_path(str(f)) == str(tmp_path / "out_1.txt")

    d = tmp_path / "run"
    d.mkdir()
    # An existing EMPTY directory is reused (the CLI pre-creates the output
    # folder for its log; re-uniquifying would strand the log, see
    # get_unique_path docstring). A log file alone still counts as empty.
    assert get_unique_path(str(d)) == str(d)
    (d / "deep_cartograph.log").write_text("")
    assert get_unique_path(str(d)) == str(d)
    (d / "analyze_geometry").mkdir()
    (tmp_path / "run_1").mkdir()
    (tmp_path / "run_1" / "x").write_text("")
    assert get_unique_path(str(d)) == str(tmp_path / "run_2")


def test_closest_power_of_two():
    # largest power of two strictly below n (reference common.py:645-666)
    assert closest_power_of_two(264) == 256
    assert closest_power_of_two(256) == 128
    assert closest_power_of_two(3) == 2


def test_read_features_list(tmp_path):
    assert read_features_list(None) is None
    p = tmp_path / "feats.txt"
    p.write_text("dist-@CA_1-@CA_3\n\n  tor-@A_1-@B_2-@C_3-@D_4  \n")
    assert read_features_list(str(p)) == [
        "dist-@CA_1-@CA_3",
        "tor-@A_1-@B_2-@C_3-@D_4",
    ]


def test_plumed_analysis_command_builders():
    """Legacy ALPHABETA sin/cos proxies and the FES-analysis action builders
    (reference command.py parity surface)."""
    from deep_cartograph_tpu.plumed import command as cmd

    assert cmd.sin_old("s1", ["@CA-1", "@CA-2", "@CA-3", "@CA-4"]) == (
        "s1: ALPHABETA ATOMS1=@CA-1,@CA-2,@CA-3,@CA-4 REFERENCE=-1.5708\n"
    )
    assert cmd.cos_old("c1", ["@CA-1", "@CA-2", "@CA-3", "@CA-4"]) == (
        "c1: ALPHABETA ATOMS1=@CA-1,@CA-2,@CA-3,@CA-4 REFERENCE=0\n"
    )
    dg = cmd.dumpgrid(["hist"], "fes.dat", stride=500)
    assert dg.startswith("DUMPGRID GRID=hist FILE=fes.dat") and "STRIDE=500" in dg
    fes = cmd.convert_to_fes("fes", ["hist"], temp=300.0)
    assert fes == "fes: CONVERT_TO_FES GRID=hist TEMP=300.0 MINTOZERO\n"
    rw = cmd.reweight_bias("w", ["opes.bias"], temp=300.0)
    assert rw == "w: REWEIGHT_BIAS ARG=opes.bias TEMP=300.0\n"


def test_common_misc_helpers(tmp_path):
    """remove_dirs, write_as_csv time-axis continuation, and
    create_dataset_from_dataframe column filtering."""
    import pandas as pd

    from deep_cartograph_tpu.utils.common import (
        create_dataset_from_dataframe,
        remove_dirs,
        write_as_csv,
    )

    d = tmp_path / "gone"
    d.mkdir()
    (d / "f.txt").write_text("x")
    remove_dirs(str(d), str(tmp_path / "never_existed"))
    assert not d.exists()

    # write_as_csv: appends continuing the time axis (ns -> ps)
    path = str(tmp_path / "colvars.dat")
    df = pd.DataFrame({"time": [0.0, 0.001, 0.002], "a": [1.0, 2.0, 3.0]})
    write_as_csv(df, path)
    write_as_csv(df, path)  # second call drops the repeated t=0 sample
    lines = open(path).read().splitlines()
    assert lines[0] == "#! FIELDS time a"
    times = [float(l.split()[0]) for l in lines[1:]]
    assert times == sorted(times) and len(times) == 5
    assert times[-1] == 4.0  # 2 ps + 2 ps continuation

    mat = create_dataset_from_dataframe(
        pd.DataFrame({"time": [0.0], "dist-a": [1.0], "opes.bias": [9.0],
                      "labels": [1], "walker_id": [0]})
    )
    assert mat.shape == (1, 1)  # only the feature column survives


def test_stage_timer_logs_and_times():
    import logging
    import time as _time

    from deep_cartograph_tpu.utils.profiling import stage_timer

    # Attach a handler directly (earlier tests' fileConfig may disable or
    # redirect the package loggers, which would make caplog miss records).
    records = []
    handler = logging.Handler()
    handler.emit = records.append
    log = logging.getLogger("deep_cartograph_tpu.utils.profiling")
    old = (log.level, log.disabled, log.propagate)
    log.addHandler(handler)
    log.setLevel(logging.INFO)
    log.disabled = False
    try:
        with stage_timer("unit test stage"):
            _time.sleep(0.01)
    finally:
        log.removeHandler(handler)
        log.level, log.disabled, log.propagate = old
    msgs = [r.getMessage() for r in records]
    assert any(
        "Elapsed time (unit test stage)" in m for m in msgs
    ), msgs
