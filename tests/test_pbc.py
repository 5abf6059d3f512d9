"""PBC preparation: unwrap across boundaries + center-in-box, box readers."""

import numpy as np

from deep_cartograph_tpu.geom.pbc import (
    bond_spanning_levels,
    center_in_box,
    make_whole,
    prepare_frames,
)
from deep_cartograph_tpu.io.boxes import read_box


def _wrapped_chain(n_atoms, box, rng, spacing=1.4):
    """A linear chain crossing a periodic boundary, returned wrapped."""
    start = rng.uniform(0, box, 3).astype(np.float32)
    direction = rng.standard_normal(3).astype(np.float32)
    direction /= np.linalg.norm(direction)
    true_pos = start[None] + np.arange(n_atoms)[:, None] * spacing * direction
    wrapped = true_pos - box * np.floor(true_pos / box)
    return true_pos.astype(np.float32), wrapped.astype(np.float32)


def test_make_whole_restores_bond_lengths():
    rng = np.random.default_rng(0)
    box = np.asarray([20.0, 25.0, 30.0], np.float32)
    n = 12
    true_pos, wrapped = _wrapped_chain(n, box, rng)
    assert np.abs(np.diff(wrapped, axis=0)).max() > 5.0  # actually crosses

    bonds = [(i, i + 1) for i in range(n - 1)]
    levels = bond_spanning_levels(bonds, n)
    whole = make_whole(wrapped[None], box, levels)[0]

    d = np.linalg.norm(np.diff(whole, axis=0), axis=1)
    np.testing.assert_allclose(d, 1.4, atol=1e-4)
    # Shape identical to the unwrapped original (up to a lattice translation)
    shift = whole[0] - true_pos[0]
    np.testing.assert_allclose(
        whole - true_pos, np.broadcast_to(shift, (n, 3)), atol=1e-3
    )
    lattice = shift / box
    np.testing.assert_allclose(lattice, np.round(lattice), atol=1e-4)


def test_center_in_box_centers_group():
    rng = np.random.default_rng(1)
    box = np.asarray([15.0, 15.0, 15.0], np.float32)
    coords = rng.uniform(0, 15, (4, 9, 3)).astype(np.float32)
    group = np.arange(5)
    out = center_in_box(coords, box, group, wrap=True)
    centers = out[:, group].mean(axis=1)
    np.testing.assert_allclose(
        centers, np.broadcast_to(box / 2, centers.shape), atol=1e-4
    )


def test_prepare_frames_multi_molecule_multi_frame():
    rng = np.random.default_rng(2)
    box = np.asarray([18.0, 18.0, 18.0], np.float32)
    frames = []
    for _ in range(3):
        _, w1 = _wrapped_chain(6, box, rng)
        _, w2 = _wrapped_chain(5, box, rng)
        frames.append(np.concatenate([w1, w2]))
    coords = np.stack(frames)
    bonds = [(i, i + 1) for i in range(5)] + [(6 + i, 7 + i) for i in range(4)]

    out = prepare_frames(coords, np.tile(box, (3, 1)), bonds)
    for f in range(3):
        d1 = np.linalg.norm(np.diff(out[f, :6], axis=0), axis=1)
        d2 = np.linalg.norm(np.diff(out[f, 6:], axis=0), axis=1)
        np.testing.assert_allclose(np.concatenate([d1, d2]), 1.4, atol=1e-4)
    # Centering is a rigid per-frame translation of the unwrapped coords,
    # with the WRAPPED group center moved to the box center (MDAnalysis
    # center_in_box(wrap=True) semantics).
    whole = make_whole(
        coords, np.tile(box, (3, 1)), bond_spanning_levels(bonds, 11)
    )
    shift = out - whole
    np.testing.assert_allclose(
        shift, np.broadcast_to(shift[:, :1, :], shift.shape), atol=1e-4
    )
    wrapped = whole - box * np.floor(whole / box)
    expected = box / 2 - wrapped.mean(axis=1)
    np.testing.assert_allclose(shift[:, 0, :], expected, atol=1e-3)


def test_prepare_frames_no_box_is_noop(caplog):
    coords = np.zeros((2, 3, 3), np.float32)
    out = prepare_frames(coords, None, [(0, 1)])
    np.testing.assert_array_equal(out, coords)


def test_read_box_gro(tmp_path):
    path = tmp_path / "b.gro"
    body = "frame\n2\n"
    body += "    1ALA     CA    1   0.100   0.200   0.300\n"
    body += "    2ALA     CA    2   0.400   0.500   0.600\n"
    body += "   2.50000   3.00000   3.50000\n"
    path.write_text(body * 2)
    box = read_box(str(path))
    assert box.shape == (2, 3)
    np.testing.assert_allclose(box[0], [25.0, 30.0, 35.0], atol=1e-4)


def test_read_box_pdb_cryst1(tmp_path):
    path = tmp_path / "b.pdb"
    path.write_text(
        "CRYST1   40.000   50.000   60.000  90.00  90.00  90.00 P 1\n"
        "MODEL     1\n"
        "ATOM      1  CA  ALA A   1       1.000   2.000   3.000  1.00  0.00"
        "           C\n"
        "ENDMDL\nMODEL     2\n"
        "ATOM      1  CA  ALA A   1       1.500   2.000   3.000  1.00  0.00"
        "           C\n"
        "ENDMDL\nEND\n"
    )
    box = read_box(str(path))
    assert box.shape == (2, 3)
    np.testing.assert_allclose(box[0], [40.0, 50.0, 60.0])


def test_read_box_absent(tmp_path):
    from deep_cartograph_tpu.io.traj import write_traj

    coords = np.zeros((2, 3, 3), np.float32)
    path = str(tmp_path / "t.dcd")
    write_traj(path, coords)
    assert read_box(path) is None
    assert read_box(str(tmp_path / "t.xyz")) is None  # unsupported format
