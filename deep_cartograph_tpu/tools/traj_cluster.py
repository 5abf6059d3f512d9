"""traj_cluster tool + workflow: cluster trajectories in CV space.

Parity with the reference tool and TrajClusterWorkflow
(deep_cartograph/tools/traj_cluster/traj_cluster.py:18-114 and
traj_cluster_workflow.py:20-387): optimized clustering over a search
interval, centroid marking + PDB extraction, cluster-ensemble trajectory
extraction, supplementary-data 1-NN assignment, scatter/size plots.
"""

from __future__ import annotations

import logging
import os
import time
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np
import pandas as pd

from deep_cartograph_tpu.cluster import (
    assign_nearest_neighbor,
    find_centroids,
    optimize_clustering,
)
from deep_cartograph_tpu.config.schemas import TrajClusterSchema
from deep_cartograph_tpu.figures import (
    clusters_scatter_plot,
    generate_colors,
    plot_clusters_size,
)
from deep_cartograph_tpu.io.traj import (
    extract_frames_to_pdb,
    extract_frames_to_traj,
)
from deep_cartograph_tpu.utils.common import files_exist, validate_configuration

logger = logging.getLogger("deep_cartograph_tpu")

from deep_cartograph_tpu.utils.profiling import traced


class TrajClusterWorkflow:
    def __init__(
        self,
        configuration: Dict,
        cv_traj_paths: List[str],
        trajectories: Optional[List[str]] = None,
        topologies: Optional[List[str]] = None,
        sup_cv_traj_paths: Optional[List[str]] = None,
        sup_trajectories: Optional[List[str]] = None,
        sup_topologies: Optional[List[str]] = None,
        frames_per_sample: Optional[int] = 1,
        output_folder: str = "traj_cluster",
    ):
        self.output_folder = output_folder
        self.configuration = validate_configuration(
            configuration, TrajClusterSchema, output_folder
        )
        self.figures_configuration = self.configuration["figures"]
        self.extract_centroids_condition = self.configuration[
            "output_structures"
        ] in ("centroids", "all")
        self.extract_ensembles_condition = (
            self.configuration["output_structures"] == "all"
        )
        self.cv_traj_paths = cv_traj_paths
        self.trajectories = trajectories
        self.topologies = topologies
        self.sup_cv_traj_paths = sup_cv_traj_paths
        self.sup_trajectories = sup_trajectories
        self.sup_topologies = sup_topologies
        self.frames_per_sample = frames_per_sample or 1
        self.cv_dimension: Optional[int] = None
        self.cv_labels: Optional[List[str]] = None
        # Skip input validation when clustering is disabled: the reference
        # validates before its run gate and hard-exits on missing files
        # (traj_cluster_workflow.py:70-82) even for run=False — deliberate
        # robustness improvement over the reference here.
        if self.configuration.get("run", True):
            self._validate_files()

    def _validate_files(self) -> None:
        for path in self.cv_traj_paths:
            if not files_exist(path):
                raise FileNotFoundError(f"CV trajectory {path} does not exist.")
        if self.trajectories:
            if not self.topologies:
                raise ValueError("Trajectory files provided but no topology file.")
            if len(self.trajectories) != len(self.topologies):
                raise ValueError(
                    "Different number of trajectory and topology files provided."
                )
            if len(self.trajectories) != len(self.cv_traj_paths):
                raise ValueError(
                    "Different number of trajectory and colvars files provided."
                )
        if self.sup_cv_traj_paths and self.sup_trajectories:
            if not self.sup_topologies:
                raise ValueError(
                    "Supplementary trajectory files provided but no topology file."
                )

    def read_cv_traj_data(self, paths: List[str]) -> pd.DataFrame:
        frames = []
        for i, path in enumerate(paths):
            df = pd.read_csv(path)
            df["traj_label"] = i
            frames.append(df)
        return pd.concat(frames, ignore_index=True)

    def extract_centroids(self, data: pd.DataFrame) -> None:
        logger.info("Extracting centroids from the trajectories...")
        centroids_data = data[data["centroid"] == True]  # noqa: E712
        centroids_folder = os.path.join(self.output_folder, "centroids")
        os.makedirs(centroids_folder, exist_ok=True)
        for _, row in centroids_data.iterrows():
            traj_index = int(row["traj_label"])
            frame = int(row["frame"])
            cluster_label = row["cluster"]
            extract_frames_to_pdb(
                self.trajectories[traj_index],
                self.topologies[traj_index],
                frame,
                os.path.join(centroids_folder, f"cluster_{cluster_label}.pdb"),
            )

    def extract_cluster_ensembles(
        self, data: pd.DataFrame, output_folder: str, traj_index: int
    ) -> None:
        """Extract per-cluster sub-trajectories for ONE trajectory (the
        caller already filtered `data` to that trajectory's rows)."""
        logger.info("Extracting cluster ensembles from the trajectories...")
        for cluster_label in data["cluster"].unique():
            frames = data[data["cluster"] == cluster_label]["frame"].tolist()
            extract_frames_to_traj(
                self.trajectories[traj_index],
                self.topologies[traj_index],
                frames,
                os.path.join(output_folder, f"cluster_{cluster_label}.xtc"),
            )

    def assign_closest_cluster(
        self, new_data: pd.DataFrame, clusters_data: pd.DataFrame
    ) -> np.ndarray:
        idx = assign_nearest_neighbor(
            new_data[self.cv_labels].to_numpy(),
            clusters_data[self.cv_labels].to_numpy(),
        )
        return clusters_data.iloc[idx]["cluster"].values

    def run(self) -> Dict[str, List[str]]:
        if self.configuration["run"] is False:
            logger.info("traj_cluster workflow set to not run. Exiting...")
            return {}

        output_paths: Dict[str, List[str]] = {}
        logger.info("Starting traj_cluster workflow...")

        cv_data = self.read_cv_traj_data(self.cv_traj_paths)
        self.cv_dimension = cv_data.shape[1] - 1
        self.cv_labels = cv_data.columns[:-1].tolist()

        cluster_labels, centroids = optimize_clustering(
            cv_data[self.cv_labels].to_numpy(), dict(self.configuration)
        )
        cv_data["cluster"] = cluster_labels
        cv_data = find_centroids(cv_data, centroids, self.cv_labels)

        num_clusters = len(np.unique(cluster_labels))
        cluster_colors = generate_colors(
            num_clusters, self.figures_configuration["cmap"]
        )

        frames: List[int] = []
        for traj_index in range(len(self.cv_traj_paths)):
            n = int((cv_data["traj_label"] == traj_index).sum())
            frames.extend(
                np.arange(0, n * self.frames_per_sample, self.frames_per_sample)
            )
        cv_data["frame"] = frames

        plot_clusters_size(cluster_labels, cluster_colors, self.output_folder)

        if self.extract_centroids_condition:
            if self.trajectories and self.topologies:
                self.extract_centroids(cv_data)
            else:
                logger.warning(
                    "Trajectory and/or topology files not provided. Skipping "
                    "extraction of centroids."
                )

        for traj_index in range(len(self.cv_traj_paths)):
            traj_name = (
                Path(self.trajectories[traj_index]).stem
                if self.trajectories
                else f"traj_{traj_index}"
            )
            traj_output_folder = os.path.join(self.output_folder, traj_name)
            os.makedirs(traj_output_folder, exist_ok=True)
            traj_df = cv_data[cv_data["traj_label"] == traj_index]
            projected_path = os.path.join(
                traj_output_folder, "projected_trajectory.csv"
            )
            traj_df.to_csv(projected_path, index=False)
            output_paths[traj_name] = [projected_path]

            if self.cv_dimension == 2:
                clusters_scatter_plot(
                    data=traj_df,
                    column_labels=self.cv_labels,
                    cluster_label="cluster",
                    settings=self.figures_configuration,
                    file_path=os.path.join(
                        traj_output_folder, "trajectory_clustered.png"
                    ),
                    cluster_colors=cluster_colors,
                )
            if self.extract_ensembles_condition:
                if self.trajectories and self.topologies:
                    self.extract_cluster_ensembles(
                        traj_df, traj_output_folder, traj_index
                    )
                else:
                    logger.warning(
                        "Trajectory and/or topology files not provided. "
                        "Skipping extraction of cluster ensembles."
                    )

        if self.sup_cv_traj_paths:
            logger.info(
                "Assigning clusters to supplementary CV trajectories..."
            )
            sup_cv_data = self.read_cv_traj_data(self.sup_cv_traj_paths)
            if sup_cv_data.shape[1] - 1 != self.cv_dimension:
                raise ValueError(
                    "Dimensionality of supplementary CV data does not match."
                )
            sup_cv_data["cluster"] = self.assign_closest_cluster(
                sup_cv_data, cv_data
            )
            for traj_index in range(len(self.sup_cv_traj_paths)):
                traj_name = (
                    f"sup_{Path(self.sup_trajectories[traj_index]).stem}"
                    if self.sup_trajectories
                    else f"sup_traj_{traj_index}"
                )
                traj_output_folder = os.path.join(self.output_folder, traj_name)
                os.makedirs(traj_output_folder, exist_ok=True)
                traj_df = sup_cv_data[sup_cv_data["traj_label"] == traj_index]
                projected_path = os.path.join(
                    traj_output_folder, "projected_trajectory.csv"
                )
                traj_df.to_csv(projected_path, index=False)
                output_paths[traj_name] = [projected_path]
                if self.cv_dimension == 2:
                    clusters_scatter_plot(
                        data=traj_df,
                        column_labels=self.cv_labels,
                        cluster_label="cluster",
                        settings=self.figures_configuration,
                        file_path=os.path.join(
                            traj_output_folder, "trajectory_clustered.png"
                        ),
                        cluster_colors=cluster_colors,
                    )
        return output_paths


@traced("traj_cluster")
def traj_cluster(
    configuration: Dict,
    cv_traj_paths: List[str],
    trajectories: Optional[List[str]] = None,
    topologies: Optional[List[str]] = None,
    sup_cv_traj_paths: Optional[List[str]] = None,
    sup_trajectories: Optional[List[str]] = None,
    sup_topologies: Optional[List[str]] = None,
    frames_per_sample: Optional[int] = 1,
    output_folder: str = "traj_cluster",
) -> Dict:
    """Cluster CV-space trajectories (cf. reference traj_cluster.py:18-114)."""
    logger.info("=====================")
    logger.info("Trajectory clustering")
    logger.info("=====================")
    start_time = time.time()
    os.makedirs(output_folder, exist_ok=True)
    workflow = TrajClusterWorkflow(
        configuration=configuration,
        cv_traj_paths=cv_traj_paths,
        trajectories=trajectories,
        topologies=topologies,
        sup_cv_traj_paths=sup_cv_traj_paths,
        sup_trajectories=sup_trajectories,
        sup_topologies=sup_topologies,
        frames_per_sample=frames_per_sample,
        output_folder=output_folder,
    )
    result = workflow.run()
    elapsed = time.time() - start_time
    logger.info(
        "Elapsed time (Trajectory clustering): %s",
        time.strftime("%H h %M min %S s", time.gmtime(elapsed)),
    )
    return result
