"""traj_projection tool + workflow: project new colvars onto saved CV models.

Parity with the reference tool and TrajProjectionWorkflow
(deep_cartograph/tools/traj_projection/traj_projection.py:19-97 and
traj_projection_workflow.py:20-298): loads self-describing model.zip files,
projects, writes projected_trajectory.csv per trajectory, FES plots with
scatter overlays of the projected data.
"""

from __future__ import annotations

import logging
import os
import time
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np
import pandas as pd

from deep_cartograph_tpu.config.schemas import TrajProjectionSchema
from deep_cartograph_tpu.cv.base import CVCalculator
from deep_cartograph_tpu.fes import plot_fes
from deep_cartograph_tpu.figures import gradient_scatter_plot
from deep_cartograph_tpu.io.colvars import create_dataframe_from_files
from deep_cartograph_tpu.utils.common import files_exist, validate_configuration

logger = logging.getLogger("deep_cartograph_tpu")

from deep_cartograph_tpu.utils.profiling import traced


class TrajProjectionWorkflow:
    def __init__(
        self,
        configuration: Dict,
        colvars_paths: List[str],
        topologies: List[str],
        trajectory_names: List[str],
        model_paths: List[str],
        model_traj_paths: Optional[List[List[str]]] = None,
        output_folder: str = "traj_projection",
    ):
        self.parent_output_folder = output_folder
        self.configuration = validate_configuration(
            configuration, TrajProjectionSchema, output_folder
        )
        self.figures_configuration = self.configuration["figures"]
        self.colvars_paths = colvars_paths
        self.topologies = topologies
        self.trajectory_names = trajectory_names
        self.model_paths = model_paths
        self.model_traj_paths = model_traj_paths
        self.cv_name: Optional[str] = None
        self.cv_dimension: Optional[int] = None
        self.cv_labels: Optional[List[str]] = None
        self._validate_files()

    def _validate_files(self) -> None:
        for path in self.colvars_paths:
            if not files_exist(path):
                raise FileNotFoundError(f"Colvars file {path} does not exist.")
        if self.topologies:
            for path in self.topologies:
                if not files_exist(path):
                    raise FileNotFoundError(f"Topology file {path} does not exist.")
            if len(self.topologies) != len(self.colvars_paths):
                raise ValueError(
                    "Number of topologies must match number of colvars files."
                )
        for path in self.model_paths or []:
            if not files_exist(path):
                raise FileNotFoundError(f"CV model file {path} does not exist.")

    def create_fes_plots(
        self,
        main_data: pd.DataFrame,
        output_folder: str,
        sup_data: Optional[List[np.ndarray]] = None,
        sup_data_labels: Optional[List[str]] = None,
    ) -> None:
        for dim in range(self.cv_dimension):
            folder = os.path.join(output_folder, f"fes_{self.cv_name}_{dim + 1}")
            os.makedirs(folder, exist_ok=True)
            plot_fes(
                data=main_data.iloc[:, dim].to_numpy(),
                cv_labels=[self.cv_labels[dim]],
                settings=self.figures_configuration["fes"],
                output_path=folder,
                num_blocks=100,
                sup_data=[x[:, dim] for x in sup_data] if sup_data else None,
                sup_data_labels=sup_data_labels,
            )
        if self.cv_dimension > 1:
            for i in range(self.cv_dimension - 1):
                for j in range(i + 1, self.cv_dimension):
                    folder = os.path.join(
                        output_folder, f"fes_{self.cv_name}_{i + 1}_{j + 1}"
                    )
                    os.makedirs(folder, exist_ok=True)
                    plot_fes(
                        data=main_data.iloc[:, [i, j]].to_numpy(),
                        cv_labels=[self.cv_labels[i], self.cv_labels[j]],
                        settings=self.figures_configuration["fes"],
                        output_path=folder,
                        num_blocks=1,
                        sup_data=[x[:, [i, j]] for x in sup_data]
                        if sup_data
                        else None,
                        sup_data_labels=sup_data_labels,
                    )

    def run(self) -> Dict[str, Dict]:
        output_cv_data: Dict[str, Dict] = {}
        logger.info("Starting traj_projection workflow...")

        for model_index, model_path in enumerate(self.model_paths):
            cv_calculator = CVCalculator.load(
                model_path=model_path, output_path=self.parent_output_folder
            )
            self.cv_name = cv_calculator.cv_name
            self.cv_dimension = cv_calculator.cv_dimension
            self.cv_labels = cv_calculator.cv_labels
            cv_output_folder = os.path.join(self.parent_output_folder, self.cv_name)
            os.makedirs(cv_output_folder, exist_ok=True)

            traj_paths = [
                os.path.join(cv_output_folder, name, "projected_trajectory.csv")
                for name in self.trajectory_names
            ]
            output_cv_data[self.cv_name] = {"traj_paths": traj_paths}
            if files_exist(*traj_paths, verbose=False):
                logger.info(
                    "Projected trajectory files for CV %s already exist. "
                    "Skipping projection...",
                    self.cv_name,
                )
                continue

            projected = cv_calculator.project_colvars(
                colvars_paths=self.colvars_paths, topology_paths=self.topologies
            )
            projected["traj_label"] = cv_calculator.projection_data_labels
            per_traj = [
                projected[projected["traj_label"] == i].drop(columns=["traj_label"])
                for i in range(len(self.colvars_paths))
            ]

            for index, df_i in enumerate(per_traj):
                df_i = df_i.copy()
                df_i["frame"] = np.arange(len(df_i))
                name = self.trajectory_names[index]
                traj_output_folder = os.path.join(cv_output_folder, name)
                os.makedirs(traj_output_folder, exist_ok=True)
                if self.cv_dimension == 2:
                    gradient_scatter_plot(
                        data=df_i,
                        column_labels=self.cv_labels,
                        color_label="frame",
                        settings=self.figures_configuration["traj_projection"],
                        file_path=os.path.join(traj_output_folder, "trajectory.png"),
                    )
                df_i = df_i.drop(columns=["frame"])
                df_i.to_csv(
                    os.path.join(traj_output_folder, "projected_trajectory.csv"),
                    index=False,
                    float_format="%.4f",
                )

            if self.model_traj_paths is not None:
                main_data = create_dataframe_from_files(
                    self.model_traj_paths[model_index]
                )
                self.create_fes_plots(
                    main_data=main_data,
                    output_folder=os.path.join(cv_output_folder, "fes"),
                    sup_data=[df.to_numpy() for df in per_traj],
                    sup_data_labels=self.trajectory_names,
                )
        return output_cv_data


@traced("traj_projection")
def traj_projection(
    configuration: Dict,
    colvars_paths: List[str],
    topologies: Optional[List[str]] = None,
    trajectory_names: Optional[List[str]] = None,
    model_paths: Optional[List[str]] = None,
    model_traj_paths: Optional[List[List[str]]] = None,
    output_folder: str = "traj_projection",
) -> Dict:
    """Project colvars onto saved CV models
    (cf. reference traj_projection.py:19-97)."""
    logger.info("=====================")
    logger.info("Trajectory projection")
    logger.info("=====================")
    start_time = time.time()
    os.makedirs(output_folder, exist_ok=True)
    if trajectory_names is None:
        trajectory_names = [Path(p).stem for p in colvars_paths]

    workflow = TrajProjectionWorkflow(
        configuration=configuration,
        colvars_paths=colvars_paths,
        topologies=topologies,
        trajectory_names=trajectory_names,
        model_paths=model_paths,
        model_traj_paths=model_traj_paths,
        output_folder=output_folder,
    )
    result = workflow.run()
    elapsed = time.time() - start_time
    logger.info(
        "Elapsed time (Trajectory projection): %s",
        time.strftime("%H h %M min %S s", time.gmtime(elapsed)),
    )
    return result
