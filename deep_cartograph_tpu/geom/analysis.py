"""Trajectory geometry analyses on device: RMSD, RMSF, dRMSD.

Replaces the reference's MDAnalysis analysis stack
(deep_cartograph/modules/md/md.py:1397-1574): the per-frame Kabsch fits run
vmapped on device, dRMSD reuses the batched pairwise-distance featurizer.
"""

from __future__ import annotations

import logging
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from deep_cartograph_tpu.features.mapper import PDBTopologyMapper
from deep_cartograph_tpu.geom.kernels import kabsch_align, rmsd_per_frame
from deep_cartograph_tpu.io.topology import Topology
from deep_cartograph_tpu.io.traj import read_traj

logger = logging.getLogger(__name__)


def _require_atoms(idx, selection: str, context: str):
    """Empty selections poison everything downstream with NaN (mean over a
    zero-length axis); fail like the reference does (md.py:983 logs
    'Selection matched 0 atoms' and exits)."""
    if len(idx) == 0:
        raise ValueError(
            f"Selection '{selection}' matched 0 atoms ({context})."
        )
    return idx


def _mapped_resid_selection(
    selection: str, resids: List[int]
) -> str:
    resid_str = " ".join(str(r) for r in resids)
    return f"({selection}) and (resid {resid_str})"


def RMSD(
    trajectory_path: str,
    topology_path: str,
    selection: str,
    fitting_selection: str,
    reference_path: Optional[str] = None,
) -> np.ndarray:
    """Per-frame optimal-fit RMSD (Angstroms) vs a reference structure
    (first frame of the topology if no reference given), with cross-topology
    residue mapping (cf. reference md.py:1397-1454)."""
    topology = Topology.from_file(topology_path)
    ref_structure = reference_path if reference_path else topology_path
    ref_topology = Topology.from_file(ref_structure)

    mapper = PDBTopologyMapper(ref_structure, topology_path)
    pairs = [(ref_id, val[2]) for ref_id, val in mapper.mapping.items()]
    if not pairs:
        logger.error(
            "No common residues found between %s and %s", ref_structure, topology_path
        )
        return np.array([])

    ref_resids = [p[0] for p in pairs]
    sim_resids = [p[1] for p in pairs]
    fit_ref = _require_atoms(
        ref_topology.select(_mapped_resid_selection(fitting_selection, ref_resids)),
        fitting_selection, "RMSD fit (reference)",
    )
    fit_sim = _require_atoms(
        topology.select(_mapped_resid_selection(fitting_selection, sim_resids)),
        fitting_selection, "RMSD fit (trajectory)",
    )
    ana_ref = _require_atoms(
        ref_topology.select(_mapped_resid_selection(selection, ref_resids)),
        selection, "RMSD analysis (reference)",
    )
    ana_sim = _require_atoms(
        topology.select(_mapped_resid_selection(selection, sim_resids)),
        selection, "RMSD analysis (trajectory)",
    )
    if len(ana_ref) == 0 or len(ana_sim) == 0:
        logger.error("Selections resulted in zero atoms.")
        return np.array([])
    if len(ana_ref) != len(ana_sim) or len(fit_ref) != len(fit_sim):
        logger.error(
            "Number of atoms in simulation and reference selections do not match."
        )
        return np.array([])

    coords = read_traj(trajectory_path, topology_path)
    from deep_cartograph_tpu.utils.device import maybe_cpu

    with maybe_cpu(float(coords.size) * 10):
        return _rmsd_device(
            coords, ref_topology, fit_sim, fit_ref, ana_sim, ana_ref
        )


def _rmsd_device(coords, ref_topology, fit_sim, fit_ref, ana_sim, ana_ref):
    mobile_fit = jnp.asarray(coords[:, fit_sim])
    ref_fit = jnp.asarray(ref_topology.positions[fit_ref])
    mobile_ana = jnp.asarray(coords[:, ana_sim])
    ref_ana = jnp.asarray(ref_topology.positions[ana_ref])

    # Fit on the fitting selection, measure on the analysis selection
    from deep_cartograph_tpu.geom.kernels import kabsch_rotation

    R, mc, rc = kabsch_rotation(mobile_fit, ref_fit)
    # Apply the fit transform (fit-selection centroids) to the analysis atoms
    aligned_ana = (mobile_ana - mc) @ jnp.swapaxes(R, -1, -2) + rc
    diff = aligned_ana - ref_ana
    return np.asarray(jnp.sqrt(jnp.mean(jnp.sum(diff * diff, -1), axis=-1)))


def RMSF(
    trajectory_path: str,
    topology_path: str,
    selection: str,
    fitting_selection: str,
) -> Tuple[List[float], List[int]]:
    """Per-residue RMSF after aligning to the average structure
    (cf. reference md.py:1456-1497): frames are aligned to frame 0, averaged,
    re-aligned to the average, then per-atom fluctuations are averaged per
    residue."""
    topology = Topology.from_file(topology_path)
    coords = read_traj(trajectory_path, topology_path)
    fit_idx = _require_atoms(
        topology.select(fitting_selection), fitting_selection, "RMSF fit"
    )
    rmsf_idx = _require_atoms(
        topology.select(selection), selection, "RMSF analysis"
    )

    from deep_cartograph_tpu.utils.device import maybe_cpu

    with maybe_cpu(float(coords.size) * 10):
        frames = jnp.asarray(coords)
        # Step 1: average structure from frames aligned to frame 0 on fit atoms
        ref0 = frames[0]
        R, mc, rc = _fit_transform(frames, ref0, fit_idx)
        aligned = (frames - mc) @ jnp.swapaxes(R, -1, -2) + rc
        average = jnp.mean(aligned, axis=0)
        # Step 2: align all frames to the average
        R, mc, rc = _fit_transform(frames, average, fit_idx)
        aligned = (frames - mc) @ jnp.swapaxes(R, -1, -2) + rc
        # Per-atom RMSF over the analysis selection
        sel = aligned[:, rmsf_idx]
        mean_pos = jnp.mean(sel, axis=0)
        rmsf_atoms = np.asarray(
            jnp.sqrt(jnp.mean(jnp.sum((sel - mean_pos) ** 2, -1), axis=0))
        )

    resids = topology.resids[rmsf_idx]
    residues = sorted(set(int(r) for r in resids))
    rmsf_per_residue = [
        float(np.mean(rmsf_atoms[resids == r])) for r in residues
    ]
    return rmsf_per_residue, residues


def _fit_transform(frames, reference, fit_idx):
    from deep_cartograph_tpu.geom.kernels import kabsch_rotation

    return kabsch_rotation(
        frames[:, fit_idx], jnp.asarray(reference)[fit_idx]
    )


def dRMSD(
    trajectory_path: str,
    topology_path: str,
    selection: str,
    selection_stride: int,
    reference_path: str,
    output_path: Optional[str] = None,
) -> np.ndarray:
    """Per-frame distance-matrix RMSD vs a reference structure
    (cf. reference md.py:1499-1574, which shells out to compute_features; here
    the pairwise distances run directly through the batched featurizer)."""
    from deep_cartograph_tpu.features.discovery import get_distance_labels
    from deep_cartograph_tpu.features.translator import Translator
    from deep_cartograph_tpu.geom.engine import Featurizer

    group = {
        "first_selection": selection,
        "second_selection": selection,
        "first_stride": selection_stride,
        "second_stride": selection_stride,
        "skip_neigh_residues": True,
        "skip_bonded_atoms": True,
    }
    ref_topology = Topology.from_file(reference_path)
    labels = get_distance_labels(ref_topology, group)
    if not labels:
        raise ValueError("No pairwise distances found for dRMSD selection.")

    # Reference distances (single frame)
    ref_featurizer = Featurizer(ref_topology, labels, device="auto")
    ref_distances = ref_featurizer(ref_topology.positions[None])[0]

    # Trajectory distances (translated features)
    traj_labels = Translator(reference_path, topology_path, labels).run()
    keep = [i for i, t in enumerate(traj_labels) if t is not None]
    if len(keep) < len(labels):
        logger.warning(
            "%d dRMSD distances could not be translated and were dropped.",
            len(labels) - len(keep),
        )
    topology = Topology.from_file(topology_path)
    featurizer = Featurizer(
        topology, [traj_labels[i] for i in keep], device="auto"
    )
    coords = read_traj(trajectory_path, topology_path)
    traj_distances = featurizer(coords)

    diff = traj_distances - ref_distances[keep]
    return np.asarray(np.sqrt(np.mean(diff**2, axis=1)))
