"""Device hydrogen-bond analysis: batched donor-H-acceptor geometry on TPU.

TPU-native replacement for the MDAnalysis HydrogenBondAnalysis workflow used
by the reference's extra notebook
(/root/reference/examples/notebooks/extra/h_bond_analysis.ipynb): instead of
a per-frame Python loop over donor/acceptor pairs, all frames and all
(donor, hydrogen, acceptor) triplets are evaluated in ONE vectorized XLA
program — two gathers, a distance, an angle, two compares. The criteria
match MDAnalysis defaults: donor-acceptor distance <= d_a_cutoff (Angstrom)
AND donor-hydrogen-acceptor angle >= d_h_a_angle_cutoff (degrees).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import numpy as np

DEFAULT_DH_CUTOFF = 1.25  # Angstrom: covalent D-H pairing distance


@functools.partial(
    __import__("jax").jit, static_argnames=("d_a_cutoff", "angle_cutoff_deg")
)
def _hbond_mask(
    coords,  # (F, N, 3)
    donors,  # (T,) int32 atom indices
    hydrogens,  # (T,)
    acceptors,  # (T,)
    d_a_cutoff: float,
    angle_cutoff_deg: float,
):
    """(F, T) bool: triplet t forms an H-bond in frame f."""
    import jax.numpy as jnp

    d = coords[:, donors]  # (F, T, 3)
    h = coords[:, hydrogens]
    a = coords[:, acceptors]
    da = jnp.linalg.norm(a - d, axis=-1)  # (F, T)
    v1 = d - h
    v2 = a - h
    cos = jnp.sum(v1 * v2, axis=-1) / (
        jnp.linalg.norm(v1, axis=-1) * jnp.linalg.norm(v2, axis=-1) + 1e-12
    )
    angle = jnp.degrees(jnp.arccos(jnp.clip(cos, -1.0, 1.0)))
    return (da <= d_a_cutoff) & (angle >= angle_cutoff_deg)


def pair_donor_hydrogens(
    coords_frame: np.ndarray,
    donor_indices: np.ndarray,
    hydrogen_indices: np.ndarray,
    dh_cutoff: float = DEFAULT_DH_CUTOFF,
) -> List[Tuple[int, int]]:
    """Covalently pair each hydrogen with its donor heavy atom (within
    dh_cutoff Angstrom in the given frame), like MDAnalysis' donor-hydrogen
    bonding inference."""
    pairs: List[Tuple[int, int]] = []
    if len(donor_indices) == 0:
        return pairs
    for hyd in hydrogen_indices:
        dists = np.linalg.norm(
            coords_frame[donor_indices] - coords_frame[hyd], axis=-1
        )
        j = int(np.argmin(dists))
        if dists[j] <= dh_cutoff:
            pairs.append((int(donor_indices[j]), int(hyd)))
    return pairs


def hbond_triplets(
    topology,
    coords_frame: np.ndarray,
    donors_sel: str,
    hydrogens_sel: str,
    acceptors_sel: str,
    first_selection: Optional[str] = None,
    second_selection: Optional[str] = None,
    dh_cutoff: float = DEFAULT_DH_CUTOFF,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Enumerate candidate (donor, hydrogen, acceptor) triplets.

    donors/hydrogens are restricted to `first_selection` and acceptors to
    `second_selection` when given (the notebook's residue-pair scoping).
    """
    from deep_cartograph_tpu.io.selection import evaluate_selection

    def idx(sel: str, scope: Optional[str]) -> np.ndarray:
        mask = evaluate_selection(sel, topology)
        if scope:
            mask = mask & evaluate_selection(scope, topology)
        return np.nonzero(mask)[0]

    donor_idx = idx(donors_sel, first_selection)
    hyd_idx = idx(hydrogens_sel, first_selection)
    acc_idx = idx(acceptors_sel, second_selection)
    dh_pairs = pair_donor_hydrogens(coords_frame, donor_idx, hyd_idx, dh_cutoff)

    donors, hydrogens, acceptors = [], [], []
    for don, hyd in dh_pairs:
        for acc in acc_idx:
            if int(acc) == don:
                continue
            donors.append(don)
            hydrogens.append(hyd)
            acceptors.append(int(acc))
    return (
        np.asarray(donors, np.int32),
        np.asarray(hydrogens, np.int32),
        np.asarray(acceptors, np.int32),
    )


def analyze_residue_hbonds(
    topology_file: str,
    trajectory_file: str,
    first_selection: str,
    second_selection: str,
    d_a_cutoff: float = 3.0,
    d_h_a_angle_cutoff: float = 150.0,
    donors_sel: Optional[str] = None,
    hydrogens_sel: Optional[str] = None,
    acceptors_sel: Optional[str] = None,
    remove_pbc: bool = False,
) -> Tuple["pd.DataFrame", int]:
    """H-bonds between two selections along a trajectory.

    Same signature and return shape as the reference notebook's helper
    (h_bond_analysis.ipynb `analyze_residue_hbonds`): a DataFrame with one
    row per (frame, donor, hydrogen, acceptor) H-bond event — columns
    frame/donor_index/hydrogen_index/acceptor_index/distance/angle — plus
    the trajectory's frame count. The geometry runs on device for all
    frames at once.
    """
    import jax.numpy as jnp
    import pandas as pd

    from deep_cartograph_tpu.io.topology import parse_pdb
    from deep_cartograph_tpu.io.traj import read_traj

    topology = parse_pdb(topology_file)
    coords = read_traj(trajectory_file, topology_file)  # (F, N, 3) Angstrom
    if remove_pbc:
        # Unwrap molecules across the box and re-center (the notebook's
        # remove_pbc flag; same transform stack as traj preparation).
        from deep_cartograph_tpu.geom.pbc import prepare_frames
        from deep_cartograph_tpu.io.boxes import read_box

        box = read_box(trajectory_file)
        bonds = topology.guess_bonds(
            box=box[0] if box is not None else None
        )
        coords = prepare_frames(coords, box, bonds)
    n_frames = coords.shape[0]

    donors, hydrogens, acceptors = hbond_triplets(
        topology,
        coords[0],
        donors_sel or "name N* or name O*",
        hydrogens_sel or "name H*",
        acceptors_sel or "name O*",
        first_selection=first_selection,
        second_selection=second_selection,
    )
    if donors.size == 0:
        return (
            pd.DataFrame(
                columns=[
                    "frame",
                    "donor_index",
                    "hydrogen_index",
                    "acceptor_index",
                    "distance",
                    "angle",
                ]
            ),
            n_frames,
        )

    mask = np.asarray(
        _hbond_mask(
            jnp.asarray(coords),
            jnp.asarray(donors),
            jnp.asarray(hydrogens),
            jnp.asarray(acceptors),
            float(d_a_cutoff),
            float(d_h_a_angle_cutoff),
        )
    )
    frames_i, trip_i = np.nonzero(mask)
    d = coords[frames_i, donors[trip_i]]
    h = coords[frames_i, hydrogens[trip_i]]
    a = coords[frames_i, acceptors[trip_i]]
    dist = np.linalg.norm(a - d, axis=-1)
    v1, v2 = d - h, a - h
    cos = np.sum(v1 * v2, axis=-1) / (
        np.linalg.norm(v1, axis=-1) * np.linalg.norm(v2, axis=-1) + 1e-12
    )
    angle = np.degrees(np.arccos(np.clip(cos, -1.0, 1.0)))
    df = pd.DataFrame(
        {
            "frame": frames_i,
            "donor_index": donors[trip_i],
            "hydrogen_index": hydrogens[trip_i],
            "acceptor_index": acceptors[trip_i],
            "distance": dist,
            "angle": angle,
        }
    )
    return df, n_frames


def hbond_occupancy(df, n_frames: int) -> float:
    """Fraction of frames with at least one H-bond event."""
    if len(df) == 0:
        return 0.0
    return float(df["frame"].nunique()) / float(n_frames)


def plot_multibond_barcode(
    hbond_dict: Dict[str, "pd.DataFrame"],
    total_frames: int,
    dt: float = 1.0,
    title: str = "",
    file_path: Optional[str] = None,
):
    """Barcode plot: one lane per labelled bond, a tick per frame where the
    bond exists (the notebook's plot_multibond_barcode_pub)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(hbond_dict)
    fig, ax = plt.subplots(figsize=(10, 0.8 * n + 1.2))
    for lane, (label, df) in enumerate(hbond_dict.items()):
        frames = np.unique(df["frame"].to_numpy()) if len(df) else []
        for f in frames:
            ax.plot(
                [f * dt, f * dt],
                [lane - 0.35, lane + 0.35],
                color="tab:blue",
                linewidth=0.8,
            )
        occ = hbond_occupancy(df, total_frames) * 100
        ax.text(
            total_frames * dt * 1.01, lane, f"{occ:.0f}%", va="center"
        )
    ax.set_yticks(range(n))
    ax.set_yticklabels(list(hbond_dict.keys()))
    ax.set_xlim(0, total_frames * dt * 1.08)
    ax.set_xlabel("time")
    ax.set_title(title)
    fig.tight_layout()
    if file_path:
        fig.savefig(file_path, dpi=120)
        plt.close(fig)
        return None
    return fig
