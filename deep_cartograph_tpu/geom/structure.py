"""Structure-level utilities: RMSD templates, waypoint references, sensitivity
mapping to B-factors.

Parity with the reference md-module PDB tooling
(deep_cartograph/modules/md/md.py:1235-1395, 1608-1655), with the alignment
math running through the device Kabsch kernel.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, List, Optional

import numpy as np

from deep_cartograph_tpu.features.mapper import PDBTopologyMapper
from deep_cartograph_tpu.io.topology import Topology

logger = logging.getLogger(__name__)


def create_plumed_rmsd_template(
    topology_path: str,
    output_path: str,
    align_selection: str = "backbone",
    rmsd_selection: str = "backbone",
) -> None:
    """PDB template with occupancy=1 on alignment atoms and B-factor=1 on RMSD
    atoms (PLUMED FIT_TO_TEMPLATE/RMSD convention; cf. md.py:1235-1286)."""
    top = Topology.from_file(topology_path)
    align_idx = set(int(i) for i in top.select(align_selection))
    rmsd_idx = set(int(i) for i in top.select(rmsd_selection))
    if not align_idx:
        raise ValueError(
            f"Selection: '{align_selection}' for topology {topology_path} is "
            "empty, please review the selection string."
        )
    if not rmsd_idx:
        raise ValueError(
            f"Selection: '{rmsd_selection}' for topology {topology_path} is "
            "empty, please review the selection string."
        )
    occ = np.asarray(
        [1.0 if i in align_idx else 0.0 for i in range(top.n_atoms)], np.float32
    )
    bf = np.asarray(
        [1.0 if i in rmsd_idx else 0.0 for i in range(top.n_atoms)], np.float32
    )
    top.write_pdb(output_path, occupancies=occ, bfactors=bf)


def create_rmsd_waypoint_reference(
    waypoint_structures: List[str],
    plumed_topology_path: str,
    rmsd_restraint_reference_path: str,
    align_waypoint_structures: Optional[bool] = True,
    distance_threshold: Optional[float] = 2.0,
) -> None:
    """Mark CA atoms of residues stable across all waypoints (max pairwise
    displacement after alignment <= threshold) with occupancy/B-factor 1
    (cf. reference md.py:1288-1395)."""
    from deep_cartograph_tpu.geom.kernels import kabsch_align

    mappings = []
    for wp in waypoint_structures:
        mapper = PDBTopologyMapper(plumed_topology_path, wp)
        mappings.append(mapper.mapping)

    common = set(mappings[0].keys())
    for m in mappings[1:]:
        common &= set(m.keys())
    sorted_common = sorted(common)
    if not sorted_common:
        logger.warning("No common residues across waypoints.")

    coords_list = []
    ok_resids = list(sorted_common)
    for i, wp in enumerate(waypoint_structures):
        wp_top = Topology.from_file(wp)
        rows = []
        for r in sorted_common:
            wp_resid = mappings[i][r][2]
            try:
                rows.append(wp_top.atom_index("CA", wp_resid))
            except ValueError:
                logger.warning(
                    "Waypoint %s missing CA atom for residue %s.", wp, wp_resid
                )
                rows.append(-1)
        coords_list.append((wp_top, rows))

    valid = [
        k
        for k in range(len(sorted_common))
        if all(rows[k] >= 0 for _, rows in coords_list)
    ]
    stacked = np.stack(
        [
            top.positions[[rows[k] for k in valid]]
            for top, rows in coords_list
        ]
    )  # (n_waypoints, n_valid, 3)

    if align_waypoint_structures and stacked.shape[0] > 1:
        ref = stacked[0]
        aligned = [ref]
        for i in range(1, stacked.shape[0]):
            aligned.append(np.asarray(kabsch_align(stacked[i], ref)))
        stacked = np.stack(aligned)

    # Per-residue max pairwise displacement across waypoints
    diffs = stacked[:, None, :, :] - stacked[None, :, :, :]
    max_disp = np.sqrt((diffs**2).sum(-1)).max(axis=(0, 1))
    stable_resids = [
        sorted_common[valid[k]]
        for k in range(len(valid))
        if max_disp[k] <= distance_threshold
    ]

    plumed_top = Topology.from_file(plumed_topology_path)
    occ = np.zeros(plumed_top.n_atoms, np.float32)
    bf = np.zeros(plumed_top.n_atoms, np.float32)
    if stable_resids:
        mask = np.isin(plumed_top.resids, stable_resids) & (plumed_top.names == "CA")
        occ[mask] = 1.0
        bf[mask] = 1.0
        logger.info(
            "Reference structure created with %d active atoms.", int(mask.sum())
        )
    else:
        logger.warning("No stable residues found within the distance threshold!")
    plumed_top.write_pdb(rmsd_restraint_reference_path, occupancies=occ, bfactors=bf)


def map_sensitivity_to_structure(
    per_atom_sensitivities: Dict[int, float],
    topology_path: str,
    output_folder: str,
) -> None:
    """Write sensitivity values (scaled 0-100) into PDB B-factors for
    visualization (cf. reference md.py:1608-1655)."""
    values = np.asarray(list(per_atom_sensitivities.values()), dtype=float)
    if values.size == 0:
        logger.warning("No sensitivities to map.")
        return
    values = np.clip(values, 0.0, None)
    vmin, vmax = values.min(), values.max()
    scale = (vmax - vmin) if vmax > vmin else 1.0

    top = Topology.from_file(topology_path)
    bf = np.zeros(top.n_atoms, np.float32)
    for atom_index, sens in per_atom_sensitivities.items():
        if 0 <= atom_index < top.n_atoms:
            bf[atom_index] = (max(sens, 0.0) - vmin) / scale * 100.0
    out_path = os.path.join(output_folder, "sensitivity_structure.pdb")
    top.write_pdb(out_path, bfactors=bf)
