"""Device hydrogen-bond analysis (geom/hbonds.py): geometry criteria,
donor-H pairing, trajectory API (reference parity target: the MDAnalysis
HydrogenBondAnalysis recipe in examples/notebooks/extra/h_bond_analysis.ipynb)."""

import os

import numpy as np
import pytest

from deep_cartograph_tpu.geom.hbonds import (
    analyze_residue_hbonds,
    hbond_occupancy,
    pair_donor_hydrogens,
)
from tests.fixtures import make_backbone_system


def _triplet_frame(ha_dist: float, angle_deg: float) -> np.ndarray:
    """One frame with D at origin, H at (1,0,0), A at distance ha_dist from
    H such that the D-H-A angle is angle_deg exactly. The D-A distance
    follows from the construction (law of cosines)."""
    d = np.array([0.0, 0.0, 0.0])
    h = np.array([1.0, 0.0, 0.0])
    # H->D direction is -x; rotate it by angle_deg to get H->A direction.
    theta = np.deg2rad(angle_deg)
    a = h + ha_dist * np.array([-np.cos(theta), np.sin(theta), 0.0])
    return np.stack([d, h, a])


def test_hbond_geometry_criteria():
    import jax.numpy as jnp

    from deep_cartograph_tpu.geom.hbonds import _hbond_mask

    # angle 170 deg, |H-A|=1.9 -> |D-A| ~ 2.89 (<=3): a hydrogen bond
    good = _triplet_frame(ha_dist=1.9, angle_deg=170.0)
    # angle 170 deg, |H-A|=3.5 -> |D-A| ~ 4.49 (>3): too far
    too_far = _triplet_frame(ha_dist=3.5, angle_deg=170.0)
    # angle 90 deg, |H-A|=1.9 -> |D-A| ~ 2.15 (<=3) but angle < 150: bent
    bent = _triplet_frame(ha_dist=1.9, angle_deg=90.0)
    coords = jnp.asarray(np.stack([good, too_far, bent]))

    mask = np.asarray(
        _hbond_mask(
            coords,
            jnp.asarray([0], np.int32),
            jnp.asarray([1], np.int32),
            jnp.asarray([2], np.int32),
            3.0,
            150.0,
        )
    )
    assert mask.shape == (3, 1)
    assert mask[0, 0]
    assert not mask[1, 0]  # distance criterion
    assert not mask[2, 0]  # angle criterion


def test_pair_donor_hydrogens_nearest():
    # two donors, two hydrogens: each H pairs with its nearest donor
    coords = np.array(
        [[0.0, 0, 0], [5.0, 0, 0], [1.0, 0, 0], [5.9, 0, 0], [9.0, 0, 0]]
    )
    pairs = pair_donor_hydrogens(coords, np.array([0, 1]), np.array([2, 3, 4]))
    assert (0, 2) in pairs
    assert (1, 3) in pairs
    # the stray H at 9.0 is 3.1 A from the nearest donor -> not covalent
    assert all(h != 4 for _, h in pairs)


def test_analyze_residue_hbonds_trajectory(tmp_path):
    system = make_backbone_system(str(tmp_path), n_residues=6, n_frames=30,
                                  seed=3)
    df, n_frames = analyze_residue_hbonds(
        topology_file=system.pdb_path,
        trajectory_file=system.dcd_path,
        first_selection="resid 2",
        second_selection="resid 3",
        # generous cutoffs tuned to the coarse synthetic geometry: the
        # adjacent-residue N..O sits at ~7.7 A with a ~45 deg D-H-A angle,
        # so these GUARANTEE hits — an empty result means a regression
        d_a_cutoff=9.0,
        d_h_a_angle_cutoff=40.0,
        donors_sel="name N",
        hydrogens_sel="name H",
        acceptors_sel="name O",
    )
    assert n_frames == 30
    occ = hbond_occupancy(df, n_frames)
    assert 0.0 <= occ <= 1.0
    # cutoffs above guarantee hits; empty means a selection/mask regression
    assert len(df) > 0
    if len(df):
        assert set(
            ["frame", "donor_index", "hydrogen_index", "acceptor_index",
             "distance", "angle"]
        ) <= set(df.columns)
        assert df["distance"].max() <= 9.0
        assert df["angle"].min() >= 40.0


def test_analyze_no_candidates(tmp_path):
    system = make_backbone_system(str(tmp_path), n_residues=4, n_frames=5,
                                  seed=5)
    df, n_frames = analyze_residue_hbonds(
        topology_file=system.pdb_path,
        trajectory_file=system.dcd_path,
        first_selection="resid 1",
        second_selection="resid 4",
        donors_sel="name ZZ",  # matches nothing
        hydrogens_sel="name H",
        acceptors_sel="name O",
    )
    assert len(df) == 0 and n_frames == 5
    assert hbond_occupancy(df, n_frames) == 0.0


def test_barcode_plot(tmp_path):
    import pandas as pd

    from deep_cartograph_tpu.geom.hbonds import plot_multibond_barcode

    df = pd.DataFrame({"frame": [0, 2, 3], "distance": [2.8, 2.9, 2.7]})
    png = os.path.join(str(tmp_path), "barcode.png")
    plot_multibond_barcode({"A-B": df}, total_frames=5, dt=0.5,
                           title="test", file_path=png)
    assert os.path.getsize(png) > 0


def test_analyze_with_remove_pbc(tmp_path):
    """remove_pbc=True runs the unwrap/center preparation (warns and
    passes through when the trajectory has no box) — the notebook's
    remove_pbc parameter."""
    system = make_backbone_system(str(tmp_path), n_residues=4, n_frames=8,
                                  seed=9)
    df_raw, n1 = analyze_residue_hbonds(
        topology_file=system.pdb_path,
        trajectory_file=system.dcd_path,
        first_selection="resid 2",
        second_selection="resid 3",
        d_a_cutoff=6.0,
        d_h_a_angle_cutoff=30.0,
        donors_sel="name N",
        hydrogens_sel="name H",
        acceptors_sel="name O",
        remove_pbc=True,
    )
    assert n1 == 8  # boxless DCD: preparation is a no-op, analysis runs
