"""align_trajectories tool: sequence-alignment-driven CA alignment of many
trajectories to a reference.

Parity with the reference tool
(deep_cartograph/tools/align_trajectories/align_trajectories.py:17-189); the
per-frame optimal fits run vmapped on device via the Kabsch kernel.
"""

from __future__ import annotations

import logging
import os
import time
from pathlib import Path
from typing import List, Optional, Union

import jax.numpy as jnp
import numpy as np

from deep_cartograph_tpu.features.mapper import PDBTopologyMapper
from deep_cartograph_tpu.geom.kernels import kabsch_rotation
from deep_cartograph_tpu.io.topology import Topology
from deep_cartograph_tpu.io.traj import read_traj, write_traj
from deep_cartograph_tpu.utils.common import check_data

logger = logging.getLogger("deep_cartograph_tpu")

from deep_cartograph_tpu.utils.profiling import traced


def find_common_resids(ref_topology: str, topologies: List[str]) -> List[int]:
    """Reference resids present in every topology via sequence alignment
    (cf. reference align_trajectories.py:17-49)."""
    if not topologies:
        return []
    mapper = PDBTopologyMapper(ref_topology, topologies[0])
    common = set(mapper.mapping.keys())
    for top in topologies[1:]:
        mapper = PDBTopologyMapper(ref_topology, top)
        common &= set(mapper.mapping.keys())
    return sorted(common)


def build_ca_selection(resids: List[int]) -> str:
    resid_str = " ".join(str(r) for r in resids)
    return f"backbone and name CA and resid {resid_str}"


@traced("align_trajectories")
def align_trajectories(
    trajectory_data: Optional[Union[List[str], str]] = None,
    topology_data: Optional[Union[List[str], str]] = None,
    ref_topology: Optional[str] = None,
    output_folder: str = "align_trajectories",
) -> None:
    logger.info("==================")
    logger.info("Align Trajectories")
    logger.info("==================")
    start_time = time.time()
    os.makedirs(output_folder, exist_ok=True)

    trajectories, topologies = check_data(trajectory_data, topology_data)
    if not trajectories:
        logger.warning("No trajectories provided. Nothing to align.")
        return
    if ref_topology is None:
        ref_topology = topologies[0]
        logger.info(
            "No reference topology provided. Using first topology as "
            "reference: %s",
            Path(ref_topology).name,
        )

    common_ref_resids = find_common_resids(ref_topology, topologies)
    logger.info(
        "Found %d common residues across all topologies.", len(common_ref_resids)
    )
    if not common_ref_resids:
        logger.error(
            "No common residues found across topologies. Cannot align trajectories."
        )
        return

    ref_top = Topology.from_file(ref_topology)
    ref_sel = ref_top.select(build_ca_selection(common_ref_resids))
    ref_coords = jnp.asarray(ref_top.positions[ref_sel])

    for traj, top in zip(trajectories, topologies):
        logger.info(
            "Aligning trajectory '%s' with topology '%s'...",
            Path(traj).name,
            Path(top).name,
        )
        mapper = PDBTopologyMapper(ref_topology, top)
        target_resids = [
            r for r in (mapper.map_residue(x) for x in common_ref_resids)
            if r is not None
        ]
        if not target_resids:
            logger.error(
                "No mappable residues found for topology '%s'. Skipping.",
                Path(top).name,
            )
            continue

        mobile_top = Topology.from_file(top)
        mobile_sel = mobile_top.select(build_ca_selection(target_resids))
        n = min(len(mobile_sel), len(ref_sel))
        coords = read_traj(traj, top)
        mobile_fit = jnp.asarray(coords[:, mobile_sel[:n]])
        R, mc, rc = kabsch_rotation(mobile_fit, ref_coords[:n])
        aligned = np.asarray(
            (jnp.asarray(coords) - mc) @ jnp.swapaxes(R, -1, -2) + rc,
            np.float32,
        )

        output_traj = os.path.join(output_folder, Path(traj).name)
        output_top = os.path.join(output_folder, Path(top).stem + ".pdb")
        write_traj(output_traj, aligned, mobile_top)
        mobile_top.write_pdb(output_top, positions=aligned[0])
        logger.info("Aligned trajectory saved to: %s", output_traj)

    elapsed = time.time() - start_time
    logger.info(
        "Elapsed time (Align trajectories): %s",
        time.strftime("%H h %M min %S s", time.gmtime(elapsed)),
    )
