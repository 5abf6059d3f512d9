"""analyze_geometry tool: RMSD / RMSF / dRMSD analyses with plots + CSVs.

Parity with the reference tool
(deep_cartograph/tools/analyze_geometry/analyze_geometry.py:13-143); the
geometry math runs on device (geom/analysis.py).
"""

from __future__ import annotations

import logging
import os
import time
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from deep_cartograph_tpu.config.schemas import AnalyzeGeometrySchema
from deep_cartograph_tpu.figures import plot_data
from deep_cartograph_tpu.geom.analysis import RMSD, RMSF, dRMSD
from deep_cartograph_tpu.utils.common import save_data, validate_configuration

logger = logging.getLogger("deep_cartograph_tpu")

from deep_cartograph_tpu.utils.profiling import traced


@traced("analyze_geometry")
def analyze_geometry(
    configuration: Dict,
    trajectories: List[str],
    topologies: List[str],
    ref_topologies: Optional[List[str]] = None,
    output_folder: str = "analyze_geometry",
) -> None:
    logger.info("================")
    logger.info("Analyze geometry")
    logger.info("================")
    start_time = time.time()
    os.makedirs(output_folder, exist_ok=True)
    configuration = validate_configuration(
        configuration, AnalyzeGeometrySchema, output_folder
    )
    if not configuration["run"]:
        logger.info("Skipping Analyze Geometry step.")
        return

    dt_per_frame = float(configuration["dt_per_frame"]) * 1e-3  # ps -> ns

    for category, analyses in configuration["analysis"].items():
        if not analyses:
            continue
        logger.info("Analyzing %s...", category)
        for name, params in analyses.items():
            logger.info(" - %s", name)
            y_label = f"{category} (A)"
            y_data: Dict[str, np.ndarray] = {}
            x_data: Dict[str, np.ndarray] = {}
            x_label = "Time (ns)"

            for trajectory, topology in zip(trajectories, topologies):
                traj_name = Path(trajectory).stem
                selection = params["selection"]
                fit_selection = params.get("fit_selection")
                selection_stride = params.get("selection_stride", 1)

                if category == "RMSD":
                    refs = ref_topologies if ref_topologies else [None]
                    for ref_pdb in refs:
                        key = traj_name + (
                            f"_to_{Path(ref_pdb).stem}"
                            if ref_pdb
                            else "_first_frame"
                        )
                        y_data[key] = RMSD(
                            trajectory, topology, selection, fit_selection, ref_pdb
                        )
                        x_data[key] = np.arange(len(y_data[key])) * dt_per_frame
                elif category == "RMSF":
                    y_data[traj_name], x_data[traj_name] = RMSF(
                        trajectory, topology, selection, fit_selection
                    )
                    x_label = "Residue"
                elif category == "dRMSD":
                    refs = ref_topologies if ref_topologies else [topology]
                    for ref_pdb in refs:
                        key = f"{traj_name}_to_{Path(ref_pdb).stem}"
                        y_data[key] = dRMSD(
                            trajectory,
                            topology,
                            selection,
                            selection_stride,
                            ref_pdb,
                            os.path.join(output_folder, f"dRMSD_temp_{key}"),
                        )
                        x_data[key] = np.arange(len(y_data[key])) * dt_per_frame
                else:
                    logger.error("Unknown analysis category: %s", category)
                    continue

            figure_path = os.path.join(output_folder, f"{name}_{category}.png")
            plot_data(y_data, x_data, params["title"], y_label, x_label, figure_path)
            # Per-analysis subfolder: two same-category analyses (e.g. two
            # RMSD selections) produce identical data keys — a shared
            # folder would overwrite the first analysis' CSVs silently.
            save_data(
                y_data, x_data, y_label, x_label,
                os.path.join(output_folder, name),
            )

    elapsed = time.time() - start_time
    logger.info(
        "Elapsed time (Analyze geometry): %s",
        time.strftime("%H h %M min %S s", time.gmtime(elapsed)),
    )
