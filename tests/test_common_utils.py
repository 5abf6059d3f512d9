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
    (tmp_path / "run_1").mkdir()
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
