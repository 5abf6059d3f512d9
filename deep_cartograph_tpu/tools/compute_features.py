"""compute_features tool: trajectory -> colvars feature time series.

API parity with the reference tool
(deep_cartograph/tools/compute_features/compute_features.py:25-227), but the
computation runs on TPU through the batched featurization engine instead of a
PLUMED subprocess. A PLUMED input file is still generated per trajectory (as
the reference does) for provenance and for optional cross-engine validation.
"""

from __future__ import annotations

import logging
import os
import time
from pathlib import Path
from typing import Dict, List, Optional, Union

import numpy as np

from deep_cartograph_tpu.config.schemas import ComputeFeaturesSchema
from deep_cartograph_tpu.features.common import find_common_features
from deep_cartograph_tpu.features.translator import Translator
from deep_cartograph_tpu.geom.engine import Featurizer
from deep_cartograph_tpu.geom.structure import create_plumed_rmsd_template
from deep_cartograph_tpu.io.colvars import check, write_colvars
from deep_cartograph_tpu.io.topology import Topology, create_pdb
from deep_cartograph_tpu.plumed.builder import ComputeFeaturesBuilder
from deep_cartograph_tpu.utils.common import (
    check_data,
    files_exist,
    validate_configuration,
)

logger = logging.getLogger("deep_cartograph_tpu")

from deep_cartograph_tpu.utils.profiling import traced

# Compiled-plan reuse across trajectories AND across the pipeline's multiple
# compute_features invocations (train/validation/supplementary/waypoint data
# share one feature list + topology -> one XLA program for everything).
_featurizer_cache: Dict = {}


@traced("compute_features")
def compute_features(
    configuration: Dict,
    trajectory_data: Union[List[str], str],
    topology_data: Union[List[str], str],
    reference_topology: Optional[str] = None,
    reference_features: Optional[List[str]] = None,
    traj_stride: Optional[int] = None,
    output_folder: str = "compute_features",
) -> List[str]:
    """Compute feature time series for each trajectory.

    Returns the list of colvars file paths (one per trajectory), PLUMED-format
    text with a time column in ps — identical layout to the reference's PLUMED
    driver output.
    """
    logger.info("================")
    logger.info("Compute features")
    logger.info("================")
    start_time = time.time()

    trajectories, topologies = check_data(trajectory_data, topology_data)

    # Restart support: skip when every output colvars file already exists
    # (cf. reference compute_features.py:86-95). Output folders are keyed
    # by trajectory stem, disambiguated with the parent directory when
    # stems collide (e.g. the alanine demo's 300K/trajectory.xtc,
    # 400K/trajectory.xtc — same-stem inputs would otherwise all write to
    # ONE colvars.dat, silently overwriting each other).
    stems = [Path(t).stem for t in trajectories]
    out_names: List[str] = []
    seen: Dict[str, int] = {}
    for t, s in zip(trajectories, stems):
        name = s
        if stems.count(s) > 1:
            parent = Path(t).resolve().parent.name
            if parent:
                name = f"{parent}_{s}"
        n_prev = seen.get(name, 0)
        seen[name] = n_prev + 1
        if n_prev:
            name = f"{name}_{n_prev}"
        out_names.append(name)
    colvars_paths = [
        os.path.join(output_folder, name, "colvars.dat") for name in out_names
    ]
    if colvars_paths and all(os.path.exists(p) for p in colvars_paths):
        logger.info(
            "Colvars files already exist in %s. Skipping feature computation.",
            output_folder,
        )
        return colvars_paths

    os.makedirs(output_folder, exist_ok=True)
    configuration = validate_configuration(
        configuration, ComputeFeaturesSchema, output_folder
    )

    if len(trajectories) != len(topologies):
        raise ValueError(
            f"Number of trajectories ({len(trajectories)}) and topologies "
            f"({len(topologies)}) do not match."
        )
    if not files_exist(*trajectories) or not files_exist(*topologies):
        raise FileNotFoundError("Trajectory or topology file missing.")

    if reference_topology is None:
        reference_topology = topologies[0]
        logger.info(
            "No reference topology provided. Using the first topology as "
            "reference: %s",
            reference_topology,
        )
    if not os.path.exists(reference_topology):
        raise FileNotFoundError(
            f"Reference topology file missing: {reference_topology}"
        )

    if reference_features is None:
        reference_features = find_common_features(
            features_configuration=configuration["plumed_settings"]["features"],
            topologies=topologies,
            reference_topology=reference_topology,
            output_folder=os.path.join(output_folder, "common_features"),
        )

    if traj_stride:
        configuration["plumed_settings"]["traj_stride"] = traj_stride
    stride = configuration["plumed_settings"]["traj_stride"]
    frame_chunk = configuration["engine"]["frame_chunk"]

    # Reference PLUMED topology (provenance; cf. compute_features.py:146-148)
    ref_plumed_topology = os.path.join(output_folder, "ref_topology.pdb")
    create_pdb(reference_topology, ref_plumed_topology)

    # Phase 1 (host): per-trajectory prep — topology PDBs, feature
    # translation, PLUMED provenance inputs — and job collection.
    # Phase 2 (device): same-topology trajectories are BATCHED through one
    # Featurizer in shared chunks (one XLA program for the whole group;
    # the reference loops serially per trajectory, compute_features.py:152).
    jobs: Dict = {}  # cache_key -> (featurizer_args, [(traj, colvars, feats)])
    for topology_path, trajectory_path, colvars_path, traj_name in zip(
        topologies, trajectories, colvars_paths, out_names
    ):
        traj_output_folder = os.path.join(output_folder, traj_name)
        os.makedirs(traj_output_folder, exist_ok=True)
        if os.path.exists(colvars_path):
            logger.info("Skipping %s. Colvars file already exists.", traj_name)
            continue

        plumed_topology_path = os.path.abspath(
            os.path.join(traj_output_folder, "plumed_topology.pdb")
        )
        create_pdb(topology_path, plumed_topology_path)

        features_list = Translator(
            ref_plumed_topology, plumed_topology_path, reference_features
        ).run()
        if None in features_list:
            raise ValueError(
                f"Some common reference features could not be translated to "
                f"topology {Path(topology_path).stem}."
            )

        # Coordinate features require rigid alignment to a template
        need_fit = any(f.startswith("coord") for f in features_list)
        fit_template_path = None
        fit_template = None
        if need_fit:
            fit_template_path = os.path.join(traj_output_folder, "fit_template.pdb")
            create_plumed_rmsd_template(topology_path, fit_template_path)
            template = Topology.from_file(fit_template_path)
            fit_template = (template.positions, template.occupancies)

        # Emit the equivalent PLUMED input for provenance / cross-validation
        plumed_input_path = os.path.join(traj_output_folder, "plumed_input.dat")
        ComputeFeaturesBuilder(
            plumed_input_path=plumed_input_path,
            topology_path=plumed_topology_path,
            features_list=features_list,
            traj_stride=stride,
            fit_template_path=fit_template_path,
        ).build(colvars_path)

        cache_key = (Path(topology_path).resolve(), tuple(features_list))
        entry = jobs.setdefault(
            cache_key, ((plumed_topology_path, features_list, fit_template), [])
        )
        entry[1].append((trajectory_path, colvars_path))

    for cache_key, ((plumed_topology_path, features_list, fit_template),
                    group) in jobs.items():
        featurizer = _featurizer_cache.get(cache_key)
        if featurizer is None:
            featurizer = Featurizer(
                Topology.from_file(plumed_topology_path),
                features_list,
                fit_template,
                device=configuration["engine"].get("device", "auto"),
            )
            _featurizer_cache[cache_key] = featurizer

        group_paths = [traj for traj, _ in group]
        colvars_by_traj = {traj: cv for traj, cv in group}
        logger.info(
            "Computing features for %d trajectories sharing topology %s...",
            len(group_paths),
            Path(cache_key[0]).stem,
        )
        # Incremental iterator: each trajectory's colvars file is written as
        # soon as its frames finish, so a mid-group failure preserves the
        # completed trajectories (the restart check skips them next run).
        for trajectory_path, features in featurizer.iter_featurize_trajectories(
            group_paths,
            traj_stride=stride,
            frame_chunk=frame_chunk,
            timeout=configuration["plumed_settings"]["timeout"],
        ):
            # PLUMED-driver time convention: time(ps) = frame index (1 ps
            # steps), strided frames keep their original index.
            times = (np.arange(features.shape[0]) * stride).astype(np.float32)
            data = np.column_stack([times, features])
            colvars_path = colvars_by_traj[trajectory_path]
            write_colvars(
                colvars_path, data, ["time", *features_list], fmt="%.4f"
            )
            check(colvars_path)

    elapsed = time.time() - start_time
    logger.info(
        "Elapsed time (Compute features): %s",
        time.strftime("%H h %M min %S s", time.gmtime(elapsed)),
    )
    return colvars_paths
