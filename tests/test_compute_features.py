"""End-to-end compute_features tool tests (TPU engine vs direct numpy)."""

import os

import numpy as np

from deep_cartograph_tpu.io.colvars import read_colvars, read_column_names
from deep_cartograph_tpu.tools.compute_features import compute_features


def make_config():
    return {
        "plumed_settings": {
            "traj_stride": 1,
            "features": {
                "distance_groups": {
                    "ca_dist": {
                        "first_selection": "name CA",
                        "second_selection": "name CA",
                        "first_stride": 1,
                        "second_stride": 2,
                        "skip_neigh_residues": True,
                        "skip_bonded_atoms": False,
                    }
                },
                "dihedral_groups": {
                    "backbone_tors": {
                        "selection": "name CA",
                        "periodic_encoding": True,
                        "search_mode": "virtual",
                    }
                },
            },
        }
    }


def test_compute_features_end_to_end(ca_system, tmp_path):
    out = str(tmp_path / "compute_features")
    colvars_paths = compute_features(
        configuration=make_config(),
        trajectory_data=[ca_system.dcd_path],
        topology_data=[ca_system.pdb_path],
        output_folder=out,
    )
    assert len(colvars_paths) == 1
    assert os.path.exists(colvars_paths[0])

    cols = read_column_names(colvars_paths[0])
    assert cols[0] == "time"
    features = cols[1:]
    assert all(
        f.startswith(("dist-", "sin-", "cos-")) for f in features
    )
    df = read_colvars(colvars_paths[0])
    assert df.shape[0] == ca_system.coords.shape[0]
    assert not df.isna().any().any()

    # Spot-check one distance feature against numpy (column in nm)
    dist_cols = [c for c in features if c.startswith("dist-")]
    label = dist_cols[0]  # dist-@CA_1-@CA_3
    _, a, b = label.split("-")
    ia = int(a.split("_")[1]) - 1
    ib = int(b.split("_")[1]) - 1
    expected = (
        np.linalg.norm(
            ca_system.coords[:, ia] - ca_system.coords[:, ib], axis=-1
        )
        * 0.1
    )
    np.testing.assert_allclose(df[label].to_numpy(), expected, atol=2e-4)

    # The PLUMED provenance input exists and mentions every feature
    plumed_input = os.path.join(out, "ca_example", "plumed_input.dat")
    with open(plumed_input) as fh:
        text = fh.read()
    assert "MOLINFO" in text and "WHOLEMOLECULES" in text and "PRINT" in text
    for f in features:
        assert f in text

    # Restart: second call should skip recomputation and return same paths
    again = compute_features(
        configuration=make_config(),
        trajectory_data=[ca_system.dcd_path],
        topology_data=[ca_system.pdb_path],
        output_folder=out,
    )
    assert again == colvars_paths


def test_multi_trajectory_shared_chunks(ca_system, tmp_path, monkeypatch):
    """Same-topology trajectories are featurized through SHARED fixed-shape
    chunks: one compiled program, one packed evaluation for several small
    trajectories (the reference loops serially, compute_features.py:152)."""
    from deep_cartograph_tpu.geom.engine import (
        Featurizer,
        ShardedChunkEvaluator,
    )
    from deep_cartograph_tpu.geom.kernels import PlanEvaluator
    from deep_cartograph_tpu.io.dcd import write_dcd
    from deep_cartograph_tpu.io.topology import Topology

    # three 20-frame trajectories from slices of the fixture
    paths = []
    for i in range(3):
        p = str(tmp_path / f"traj_{i}.dcd")
        write_dcd(p, ca_system.coords[i * 20 : (i + 1) * 20])
        paths.append(p)

    top = Topology.from_file(ca_system.pdb_path)
    labels = ["dist-@CA_1-@CA_5", "dist-@CA_2-@CA_7",
              "sin-@CA_1-@CA_2-@CA_3-@CA_4", "cos-@CA_1-@CA_2-@CA_3-@CA_4"]
    featurizer = Featurizer(top, labels, device="cpu")

    calls = []

    def make_counting(orig):
        def counting(self, coords_chunk):
            calls.append(np.asarray(coords_chunk).shape[0])
            return orig(self, coords_chunk)

        return counting

    # Chunks go through either the plain evaluator or the multi-device
    # frame-sharded wrapper (8 virtual CPU devices in tests) — spy on both.
    monkeypatch.setattr(
        PlanEvaluator, "eval_raw", make_counting(PlanEvaluator.eval_raw)
    )
    monkeypatch.setattr(
        ShardedChunkEvaluator,
        "eval_raw",
        make_counting(ShardedChunkEvaluator.eval_raw),
    )
    results = featurizer.featurize_trajectories(paths, frame_chunk=64)

    # 3 x 20 = 60 frames packed into ONE 64-frame evaluation. On the
    # multi-device backend the sharded wrapper DELEGATES to the plain
    # evaluator, so each spy sees that one evaluation once.
    assert 1 <= len(calls) <= 2 and all(c == 64 for c in calls)
    assert [r.shape[0] for r in results] == [20, 20, 20]
    # identical values to the per-trajectory path
    for i, r in enumerate(results):
        expected = featurizer(ca_system.coords[i * 20 : (i + 1) * 20])
        np.testing.assert_allclose(r, expected, atol=1e-5)


def test_multi_trajectory_tool_output_matches_serial(ca_system, tmp_path):
    """Tool-level: batched multi-trajectory colvars == single-trajectory
    colvars for the same frames."""
    from deep_cartograph_tpu.io.dcd import write_dcd

    a = str(tmp_path / "part_a.dcd")
    b = str(tmp_path / "part_b.dcd")
    write_dcd(a, ca_system.coords[:25])
    write_dcd(b, ca_system.coords[25:])

    out_multi = str(tmp_path / "multi")
    paths = compute_features(
        configuration=make_config(),
        trajectory_data=[a, b],
        topology_data=ca_system.pdb_path,  # broadcast to both trajectories
        output_folder=out_multi,
    )
    out_single = str(tmp_path / "single")
    single = compute_features(
        configuration=make_config(),
        trajectory_data=[ca_system.dcd_path],
        topology_data=[ca_system.pdb_path],
        output_folder=out_single,
    )
    names = read_column_names(paths[0])
    merged = np.concatenate(
        [read_colvars(p).to_numpy() for p in paths], axis=0
    )
    ref = read_colvars(single[0]).to_numpy()
    # same features, same values (time columns restart per trajectory)
    feat_cols = [i for i, nm in enumerate(names) if nm != "time"]
    np.testing.assert_allclose(
        merged[:, feat_cols], ref[:, feat_cols], atol=1e-4
    )


def test_compute_features_with_stride(ca_system, tmp_path):
    out = str(tmp_path / "cf_stride")
    colvars_paths = compute_features(
        configuration=make_config(),
        trajectory_data=[ca_system.dcd_path],
        topology_data=[ca_system.pdb_path],
        traj_stride=3,
        output_folder=out,
    )
    df = read_colvars(colvars_paths[0])
    n_expected = (ca_system.coords.shape[0] + 2) // 3
    assert df.shape[0] == n_expected
    # time column converted to ns on read; raw was frame*3 in ps
    np.testing.assert_allclose(
        df["time"].to_numpy(), np.arange(n_expected) * 3 / 1000.0, atol=1e-6
    )


def test_featurizer_device_policies(ca_system, tmp_path):
    """"cpu" / "auto" / "default" policies all produce identical features
    (on the CPU test backend the policies collapse to the same device)."""
    from deep_cartograph_tpu.geom.engine import Featurizer
    from deep_cartograph_tpu.io.topology import Topology
    from deep_cartograph_tpu.io.traj import write_traj

    top = Topology.from_file(ca_system.pdb_path)
    coords = ca_system.coords[:20]
    traj = str(tmp_path / "t.dcd")
    write_traj(traj, coords, top)
    labels = [f"dist-@CA_{i}-@CA_{i + 2}" for i in range(1, 6)]

    results = {}
    for policy in ("default", "cpu", "auto"):
        f = Featurizer(top, labels, device=policy)
        results[policy] = f.featurize_trajectory(traj)
    np.testing.assert_array_equal(results["default"], results["cpu"])
    np.testing.assert_array_equal(results["default"], results["auto"])
    # direct numpy cross-check
    d = np.linalg.norm(coords[:, 0] - coords[:, 2], axis=-1) * 0.1
    np.testing.assert_allclose(results["default"][:, 0], d, atol=1e-5)


def test_gather_strategy_auto_density_heuristic(ca_system):
    """auto picks the selector matmul only for DENSE pair sets (small
    topologies or pairs >= atoms^2/8); sparse pairs over big topologies
    take the gather path (measured 3.7x faster at 5k atoms / 10k pairs)."""
    import numpy as np

    from deep_cartograph_tpu.features.grammar import compile_plan
    from deep_cartograph_tpu.geom.kernels import PlanEvaluator
    from deep_cartograph_tpu.io.topology import Topology
    from deep_cartograph_tpu.utils.demo_data import ca_coords, write_ca_pdb

    top_small = Topology.from_file(ca_system.pdb_path)
    dense = ["dist-@CA_1-@CA_5", "dist-@CA_2-@CA_6"]
    ev = PlanEvaluator(compile_plan(dense, top_small))
    assert ev._dist_selector is not None  # small topology -> matmul

    # 600-atom chain with only a handful of pairs: sparse -> gather
    big_pdb = ca_system.pdb_path + "_big.pdb"
    write_ca_pdb(big_pdb, ca_coords(600, 1)[0])
    top_big = Topology.from_file(big_pdb)
    # pairs span the full chain (max referenced index > 512), few of them
    sparse = [f"dist-@CA_{i}-@CA_{i + 580}" for i in range(1, 20)]
    ev2 = PlanEvaluator(compile_plan(sparse, top_big))
    assert ev2._dist_selector is None

    # both strategies agree numerically
    coords = ca_coords(600, 8, seed=3)
    ev2_mat = PlanEvaluator(compile_plan(sparse, top_big),
                            gather_strategy="matmul")
    np.testing.assert_allclose(
        np.asarray(ev2.eval_raw(coords)),
        np.asarray(ev2_mat.eval_raw(coords)),
        atol=1e-5,
    )


def test_eval_raw_subchunking_matches_single_program(ca_system, monkeypatch):
    """A caller chunk above the compile cap is evaluated in fixed-shape
    subchunks (tail padded+trimmed) with identical values."""
    import numpy as np

    from deep_cartograph_tpu.features.grammar import compile_plan
    from deep_cartograph_tpu.geom.kernels import PlanEvaluator
    from deep_cartograph_tpu.io.topology import Topology

    top = Topology.from_file(ca_system.pdb_path)
    labels = ["dist-@CA_1-@CA_5", "sin-@CA_1-@CA_2-@CA_3-@CA_4"]
    plan = compile_plan(labels, top)
    coords = ca_system.coords[:50]

    whole = np.asarray(PlanEvaluator(plan)(coords))
    capped = PlanEvaluator(plan)
    capped._compile_cap = 16  # force 3 full subchunks + padded tail
    np.testing.assert_allclose(
        np.asarray(capped.eval_raw(coords)), whole, atol=1e-6
    )
