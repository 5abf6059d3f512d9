"""Feature grammar, discovery, translation, and device-kernel correctness."""

import numpy as np
import pytest

from deep_cartograph_tpu.features.discovery import get_features_list
from deep_cartograph_tpu.features.grammar import compile_plan, parse_feature
from deep_cartograph_tpu.features.mapper import PDBTopologyMapper, local_align
from deep_cartograph_tpu.features.translator import Translator
from deep_cartograph_tpu.geom.kernels import PlanEvaluator
from deep_cartograph_tpu.io.topology import Topology
from tests.fixtures import make_shifted_ca_pdb


def numpy_dihedral(p0, p1, p2, p3):
    b0 = p0 - p1
    b1 = p2 - p1
    b2 = p3 - p2
    b1n = b1 / np.linalg.norm(b1)
    v = b0 - np.dot(b0, b1n) * b1n
    w = b2 - np.dot(b2, b1n) * b1n
    x = np.dot(v, w)
    y = np.dot(np.cross(b1n, v), w)
    return np.arctan2(y, x)


def test_parse_feature_labels():
    p = parse_feature("dist-@CA_584-@CA_549")
    assert p.kind == "dist" and p.entities == ("@CA_584", "@CA_549")
    p = parse_feature("coord-@CA_5.x")
    assert p.kind == "coord" and p.axis == 0
    p = parse_feature("sin-@CA_1-@CA_2-@CA_3-@CA_4")
    assert p.kind == "sin" and len(p.entities) == 4
    p = parse_feature("tor-@phi_7")
    assert p.kind == "tor" and p.entities == ("@phi_7",)
    with pytest.raises(ValueError):
        parse_feature("blah-@CA_1")


def test_discovery_distances_and_dihedrals(ca_system):
    features_config = {
        "distance_groups": {
            "ca_dist": {
                "first_selection": "name CA",
                "second_selection": "name CA",
                "first_stride": 1,
                "second_stride": 1,
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
    }
    labels = get_features_list(features_config, ca_system.pdb_path)
    n = ca_system.n_residues
    n_dist = sum(
        1 for i in range(n) for j in range(i + 1, n) if abs(i - j) > 1
    )
    n_dih = 2 * (n - 3)  # sin + cos per virtual dihedral
    assert len(labels) == n_dist + n_dih
    assert labels[0] == "dist-@CA_1-@CA_3"
    assert any(lbl.startswith("sin-") for lbl in labels)
    assert any(lbl.startswith("cos-") for lbl in labels)
    # sin/cos come in pairs in order
    sin_idx = [i for i, l in enumerate(labels) if l.startswith("sin-")]
    for i in sin_idx:
        assert labels[i + 1] == labels[i].replace("sin-", "cos-")


def test_plan_evaluation_matches_numpy(ca_system):
    top = Topology.from_pdb(ca_system.pdb_path)
    labels = [
        "dist-@CA_1-@CA_5",
        "dist-@CA_2-@CA_9",
        "sin-@CA_1-@CA_2-@CA_3-@CA_4",
        "cos-@CA_1-@CA_2-@CA_3-@CA_4",
        "tor-@CA_4-@CA_5-@CA_6-@CA_7",
    ]
    plan = compile_plan(labels, top)
    evaluator = PlanEvaluator(plan)
    feats = evaluator(ca_system.coords)
    assert feats.shape == (ca_system.coords.shape[0], 5)

    c = ca_system.coords
    # distances in nm
    d15 = np.linalg.norm(c[:, 0] - c[:, 4], axis=-1) * 0.1
    d29 = np.linalg.norm(c[:, 1] - c[:, 8], axis=-1) * 0.1
    np.testing.assert_allclose(feats[:, 0], d15, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(feats[:, 1], d29, rtol=1e-4, atol=1e-5)
    # dihedrals vs per-frame numpy
    for f in [0, 10, 30]:
        ang = numpy_dihedral(c[f, 0], c[f, 1], c[f, 2], c[f, 3])
        np.testing.assert_allclose(feats[f, 2], np.sin(ang), atol=1e-4)
        np.testing.assert_allclose(feats[f, 3], np.cos(ang), atol=1e-4)
        ang2 = numpy_dihedral(c[f, 3], c[f, 4], c[f, 5], c[f, 6])
        np.testing.assert_allclose(feats[f, 4], ang2, atol=1e-4)


def test_plan_coordinates_and_centers(ca_system):
    top = Topology.from_pdb(ca_system.pdb_path)
    labels = [
        "coord-@CA_3.x",
        "coord-@CA_3.y",
        "coord-@CA_3.z",
        "dist-1-center_name_CA",
    ]
    plan = compile_plan(labels, top)
    # coords require a fit template; evaluate unfitted here by passing none
    evaluator = PlanEvaluator(plan)
    feats = evaluator(ca_system.coords[:4])
    c = ca_system.coords[:4]
    np.testing.assert_allclose(feats[:, 0], c[:, 2, 0] * 0.1, atol=1e-5)
    np.testing.assert_allclose(feats[:, 2], c[:, 2, 2] * 0.1, atol=1e-5)
    center = c.mean(axis=1)
    d = np.linalg.norm(c[:, 0] - center, axis=-1) * 0.1
    np.testing.assert_allclose(feats[:, 3], d, rtol=1e-4, atol=1e-5)


def test_local_alignment_identity():
    pairs = local_align("AGSVLT", "AGSVLT")
    assert pairs == [(i, i) for i in range(6)]


def test_local_alignment_offset_and_gap():
    # target has an extra leading segment
    pairs = local_align("SVLT", "AGSVLT")
    assert pairs == [(0, 2), (1, 3), (2, 4), (3, 5)]


def test_topology_mapper_and_translator(ca_system, tmp_path):
    shifted = make_shifted_ca_pdb(str(tmp_path), ca_system, resid_offset=100)
    mapper = PDBTopologyMapper(ca_system.pdb_path, shifted)
    assert mapper.map_residue(1) == 101
    assert mapper.map_residue(12) == 112
    assert mapper.map_residue(99) is None

    labels = ["dist-@CA_1-@CA_5", "sin-@CA_1-@CA_2-@CA_3-@CA_4", "coord-@CA_2.y"]
    translated = Translator(ca_system.pdb_path, shifted, labels).run()
    assert translated[0] == "dist-@CA_101-@CA_105"
    assert translated[1] == "sin-@CA_101-@CA_102-@CA_103-@CA_104"
    assert translated[2] == "coord-@CA_102.y"
    # untranslatable -> None
    translated = Translator(ca_system.pdb_path, shifted, ["dist-@CA_1-@CA_99"]).run()
    assert translated == [None]


def test_matmul_gather_strategies_agree(ca_system):
    """The one-hot selector matmul path must match the dynamic gather path."""
    top = Topology.from_pdb(ca_system.pdb_path)
    labels = [
        "dist-@CA_1-@CA_5",
        "dist-@CA_2-@CA_9",
        "dist-@CA_3-@CA_12",
        "sin-@CA_1-@CA_2-@CA_3-@CA_4",
    ]
    plan = compile_plan(labels, top)
    gather = PlanEvaluator(plan, gather_strategy="gather")(ca_system.coords)
    matmul = PlanEvaluator(plan, gather_strategy="matmul")(ca_system.coords)
    np.testing.assert_allclose(matmul, gather, atol=1e-5)


def test_device_fn_args_closure_free_composition(ca_system):
    """device_fn_args composes into an OUTER jit with plan arrays as traced
    ARGUMENTS: values match device_fn exactly, and the lowered module stays
    small (a closure capture embeds the plan arrays — and whatever buffer
    the caller slices from — as dense XLA constants; see
    StreamingHTICA.fit_chunked's block_args contract)."""
    import jax
    import jax.numpy as jnp

    top = Topology.from_pdb(ca_system.pdb_path)
    labels = [
        "dist-@CA_1-@CA_5",
        "dist-@CA_2-@CA_9",
        "tor-@CA_4-@CA_5-@CA_6-@CA_7",
    ]
    plan = compile_plan(labels, top)
    evaluator = PlanEvaluator(plan)
    coords = jnp.asarray(ca_system.coords)

    fn, plan_args = evaluator.device_fn_args()
    outer_args = jax.jit(lambda c, *p: fn(c, *p) * 2.0)
    got = outer_args(coords, *plan_args)
    want = evaluator.eval_raw(ca_system.coords) * 2.0
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    # the args-passing lowering must not embed the big buffer: compare
    # against a closure-capturing lowering of the same computation.
    big = jnp.tile(coords, (64, 1, 1))  # make the capture cost visible
    lower_args = jax.jit(
        lambda b, *p: fn(b[: coords.shape[0]], *p)
    ).lower(big, *plan_args)
    closure_fn = evaluator.device_fn()
    lower_closure = jax.jit(
        lambda: closure_fn(big[: coords.shape[0]])
    ).lower()
    assert len(lower_args.as_text()) * 5 < len(lower_closure.as_text())
