"""train_colvars tool + workflow: train/compute all requested CVs.

Parity with the reference tool and TrainColvarsWorkflow
(deep_cartograph/tools/train_colvars/train_colvars.py:20-155 and
train_colvars_workflow.py:20-411): same output layout
(cv_name/{traj_data/<traj>/{fes,plumed_inputs,projected_trajectory.csv},
sensitivity_analysis, training, model.zip}), same restart checks, same
per-CV config merging over `common`.
"""

from __future__ import annotations

import logging
import os
import time
from pathlib import Path
from typing import Dict, List, Literal, Optional

import numpy as np
import pandas as pd

from deep_cartograph_tpu.config.schemas import TrainColvarsSchema
from deep_cartograph_tpu.cv import cv_calculators_map
from deep_cartograph_tpu.fes import plot_fes
from deep_cartograph_tpu.figures import gradient_scatter_plot
from deep_cartograph_tpu.utils.common import (
    files_exist,
    merge_configurations,
    validate_configuration,
)

logger = logging.getLogger("deep_cartograph_tpu")

from deep_cartograph_tpu.utils.profiling import traced


class TrainColvarsWorkflow:
    """Runs the train_colvars workflow (cf. reference
    train_colvars_workflow.py:20-411)."""

    def __init__(
        self,
        configuration: Dict,
        train_colvars_paths: List[str],
        train_topology_paths: Optional[List[str]] = None,
        trajectory_names: Optional[List[str]] = None,
        val_colvars_paths: Optional[List[str]] = None,
        val_topology_paths: Optional[List[str]] = None,
        sup_topology_paths: Optional[List[str]] = None,
        sup_names: Optional[List[str]] = None,
        waypoint_structures: Optional[List[str]] = None,
        ref_topology_path: Optional[str] = None,
        features_list: Optional[List[str]] = None,
        cv_dimension: Optional[int] = None,
        cvs: Optional[List[str]] = None,
        frames_per_sample: Optional[int] = 1,
        output_folder: str = "train_colvars",
    ):
        self.output_folder = output_folder
        self.configuration = validate_configuration(
            configuration, TrainColvarsSchema, output_folder
        )
        self.figures_configuration = self.configuration["figures"]

        self.train_colvars_paths = train_colvars_paths
        self.train_topology_paths = train_topology_paths
        self.trajectory_names = trajectory_names or [
            Path(f).stem for f in train_colvars_paths
        ]
        self.val_colvars_paths = val_colvars_paths
        self.val_topology_paths = val_topology_paths
        self.sup_topology_paths = sup_topology_paths
        self.sup_names = sup_names
        self.waypoint_structures = waypoint_structures
        self.ref_topology_path = ref_topology_path
        self.features_list = features_list
        if self.train_topology_paths and self.ref_topology_path is None:
            self.ref_topology_path = self.train_topology_paths[0]
        self.frames_per_sample = frames_per_sample or 1

        self._validate_files()

        self.cvs_list = cvs if cvs else self.configuration["cvs"]
        self.cv_dimension = cv_dimension
        self.cv_labels: Optional[List[str]] = None
        self.cv_type: Optional[str] = None

    def _validate_files(self) -> None:
        for path in self.train_colvars_paths:
            if not files_exist(path):
                raise FileNotFoundError(f"Colvars file {path} does not exist.")
        if self.train_topology_paths:
            for path in self.train_topology_paths:
                if not files_exist(path):
                    raise FileNotFoundError(f"Topology file {path} does not exist.")
            if self.ref_topology_path and not files_exist(self.ref_topology_path):
                raise FileNotFoundError(
                    f"Reference topology file {self.ref_topology_path} does not exist."
                )

    # -- restart bookkeeping (cf. reference :184-266) --------------------
    def get_output_cv_model_path(self, cv_name: str) -> str:
        return os.path.join(self.output_folder, cv_name, "model.zip")

    def get_output_cv_trajectories(self, cv_name: str) -> List[str]:
        traj_data = os.path.join(self.output_folder, cv_name, "traj_data")
        return [
            os.path.join(traj_data, name, "projected_trajectory.csv")
            for name in self.trajectory_names
        ]

    def workflow_finished(self) -> bool:
        for cv_name in self.cvs_list:
            if not files_exist(self.get_output_cv_model_path(cv_name), verbose=False):
                return False
            if not files_exist(
                *self.get_output_cv_trajectories(cv_name), verbose=False
            ):
                return False
        return True

    def get_output_paths(self) -> Dict:
        return {
            cv_name: {
                "output_folder": os.path.join(self.output_folder, cv_name),
                "model_path": self.get_output_cv_model_path(cv_name),
                "traj_paths": self.get_output_cv_trajectories(cv_name),
            }
            for cv_name in self.cvs_list
        }

    # -- FES plots -------------------------------------------------------
    def create_fes_plots(self, data: pd.DataFrame, output_folder: str) -> None:
        for dim in range(self.cv_dimension):
            folder = os.path.join(output_folder, f"fes_{self.cv_type}_{dim + 1}")
            os.makedirs(folder, exist_ok=True)
            plot_fes(
                data=data.iloc[:, dim].to_numpy(),
                cv_labels=[self.cv_labels[dim]],
                settings=self.figures_configuration["fes"],
                output_path=folder,
                num_blocks=100,
            )
        if self.cv_dimension > 1:
            for i in range(self.cv_dimension - 1):
                for j in range(i + 1, self.cv_dimension):
                    folder = os.path.join(
                        output_folder, f"fes_{self.cv_type}_{i + 1}_{j + 1}"
                    )
                    os.makedirs(folder, exist_ok=True)
                    plot_fes(
                        data=data.iloc[:, [i, j]].to_numpy(),
                        cv_labels=[self.cv_labels[i], self.cv_labels[j]],
                        settings=self.figures_configuration["fes"],
                        output_path=folder,
                        num_blocks=1,
                    )

    # -- main ------------------------------------------------------------
    def run(self) -> Dict:
        if self.workflow_finished():
            logger.info(
                "Skipping collective variable computation: all CVs already "
                "computed. Delete the train_colvars folder or drop -restart "
                "to recompute."
            )
            return self.get_output_paths()

        logger.info("Collective variables to compute: %s", self.cvs_list)

        for cv_name in self.cvs_list:
            cv_output_folder = os.path.join(self.output_folder, cv_name)
            # Per-CV restart (reference TrainColvarsWorkflow semantics):
            # a completed CV — model.zip + every projected trajectory —
            # is skipped, so a crash on CV k doesn't retrain CVs 1..k-1.
            if files_exist(
                self.get_output_cv_model_path(cv_name), verbose=False
            ) and files_exist(
                *self.get_output_cv_trajectories(cv_name), verbose=False
            ):
                logger.info(
                    "Skipping %s: model and projections already exist.",
                    cv_name,
                )
                continue
            merged = merge_configurations(
                self.configuration["common"], self.configuration.get(cv_name, {})
            )
            cv_calculator = cv_calculators_map[cv_name](
                configuration=merged, output_path=self.output_folder
            )
            cv_calculator.load_training_data(
                train_colvars_paths=self.train_colvars_paths,
                train_topology_paths=self.train_topology_paths,
                ref_topology_path=self.ref_topology_path,
                features_list=self.features_list,
            )
            if self.val_colvars_paths:
                cv_calculator.load_validation_data(
                    val_colvars_paths=self.val_colvars_paths,
                    val_topology_paths=self.val_topology_paths,
                    ref_topology_path=self.ref_topology_path,
                    features_list=self.features_list,
                )

            projected_train_df = cv_calculator.run(self.cv_dimension)
            self.cv_dimension = cv_calculator.get_cv_dimension()
            self.cv_labels = cv_calculator.get_labels()
            self.cv_type = cv_calculator.get_cv_type()

            if projected_train_df is None:
                logger.warning(
                    "Projected colvars dataframe is empty for %s. Skipping.",
                    cv_name,
                )
                continue

            projected_train_df["traj_label"] = cv_calculator.training_data_labels
            for traj_index in range(len(self.train_colvars_paths)):
                topology = (
                    self.train_topology_paths[traj_index]
                    if self.train_topology_paths
                    else None
                )
                traj_name = self.trajectory_names[traj_index]
                logger.info("Processing trajectory: %s", traj_name)
                traj_output_folder = os.path.join(
                    cv_output_folder, "traj_data", traj_name
                )
                os.makedirs(traj_output_folder, exist_ok=True)

                plumed_folder = os.path.join(traj_output_folder, "plumed_inputs")
                os.makedirs(plumed_folder, exist_ok=True)
                cv_calculator.write_plumed_files(
                    topology, plumed_folder, self.waypoint_structures
                )

                df_i = projected_train_df[
                    projected_train_df["traj_label"] == traj_index
                ].drop(columns=["traj_label"])

                self.create_fes_plots(
                    df_i, os.path.join(traj_output_folder, "fes")
                )

                df_i = df_i.copy()
                df_i["frame"] = np.arange(len(df_i)) * self.frames_per_sample
                if cv_calculator.get_cv_dimension() == 2:
                    gradient_scatter_plot(
                        data=df_i,
                        column_labels=cv_calculator.get_labels(),
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

            if self.sup_topology_paths is not None:
                for sup_index, sup_topology in enumerate(self.sup_topology_paths):
                    sup_name = (
                        self.sup_names[sup_index]
                        if self.sup_names
                        else Path(sup_topology).stem
                    )
                    sup_folder = os.path.join(
                        cv_output_folder, "traj_data", sup_name, "plumed_inputs"
                    )
                    os.makedirs(sup_folder, exist_ok=True)
                    cv_calculator.write_plumed_files(
                        sup_topology, sup_folder, self.waypoint_structures
                    )

        return self.get_output_paths()


@traced("train_colvars")
def train_colvars(
    configuration: Dict,
    train_colvars_paths: List[str],
    train_topologies: Optional[List[str]] = None,
    trajectory_names: Optional[List[str]] = None,
    val_colvars_paths: Optional[List[str]] = None,
    val_topologies: Optional[List[str]] = None,
    sup_topologies: Optional[List[str]] = None,
    sup_traj_names: Optional[List[str]] = None,
    waypoint_structures: Optional[List[str]] = None,
    reference_topology: Optional[str] = None,
    features_list: Optional[List[str]] = None,
    dimension: Optional[int] = None,
    cvs: Optional[List[str]] = None,
    frames_per_sample: Optional[int] = 1,
    output_folder: str = "train_colvars",
) -> Dict:
    """Train/compute all requested CVs (cf. reference train_colvars.py:20-155)."""
    logger.info("===================")
    logger.info("Training of colvars")
    logger.info("===================")
    start_time = time.time()
    os.makedirs(output_folder, exist_ok=True)

    workflow = TrainColvarsWorkflow(
        configuration=configuration,
        train_colvars_paths=train_colvars_paths,
        train_topology_paths=train_topologies,
        trajectory_names=trajectory_names,
        val_colvars_paths=val_colvars_paths,
        val_topology_paths=val_topologies,
        sup_topology_paths=sup_topologies,
        sup_names=sup_traj_names,
        waypoint_structures=waypoint_structures,
        ref_topology_path=reference_topology,
        features_list=features_list,
        cv_dimension=dimension,
        cvs=cvs,
        frames_per_sample=frames_per_sample,
        output_folder=output_folder,
    )
    result = workflow.run()

    elapsed = time.time() - start_time
    logger.info(
        "Elapsed time (Train colvars): %s",
        time.strftime("%H h %M min %S s", time.gmtime(elapsed)),
    )
    return result
