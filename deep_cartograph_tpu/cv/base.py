"""CVCalculator base class: data loading, normalization contract, run
template, model persistence, PLUMED export, sensitivity plumbing.

Behavioral parity with the reference base calculator
(deep_cartograph/modules/cv_learning/cv_calculator.py:23-746): same four
feature-normalization modes, same run() template (compute -> normalize CV ->
project -> save -> sensitivity), same self-describing model.zip layout
(metadata.json / features_labels.txt / ref_topology.pdb / weights + norm
params), same polymorphic load factory, same PLUMED file generation.
"""

from __future__ import annotations

import copy
import json
import logging
import os
import shutil
from abc import ABC, abstractmethod
from pathlib import Path
from typing import Dict, List, Optional, Tuple, Union

import numpy as np
import pandas as pd

from deep_cartograph_tpu.io.colvars import create_dataframe_from_files
from deep_cartograph_tpu.io.topology import create_pdb
from deep_cartograph_tpu.utils.common import unzip_files, zip_files

logger = logging.getLogger(__name__)

cv_names_map = {
    "pca": "PCA",
    "ae": "AE",
    "tica": "TICA",
    "htica": "HTICA",
    "deep_tica": "DeepTICA",
    "vae": "VAE",
    "umap": "UMAP",
}

cv_components_map = {
    "pca": "PC",
    "ae": "AE",
    "tica": "TIC",
    "htica": "HTIC",
    "deep_tica": "DeepTIC",
    "vae": "VAE",
    "umap": "UMAP",
}


class CVCalculator(ABC):
    """Base class for collective-variable calculators."""

    def __init__(
        self,
        configuration: Optional[Dict] = None,
        output_path: Optional[str] = None,
    ):
        self.configuration: Dict = (
            copy.deepcopy(configuration) if configuration is not None else {}
        )
        self.architecture_config: Dict = self.configuration.get("architecture", {})
        self.training_reading_settings: Dict = self.configuration.get(
            "input_colvars", {}
        )
        self.feats_norm_mode: Optional[str] = self.configuration.get(
            "features_normalization", None
        )
        self.bias: Dict = self.configuration.get("bias", {})

        self.ref_topology_path: Optional[str] = None
        self.training_data: Optional[np.ndarray] = None
        self.training_data_labels: Optional[np.ndarray] = None
        self.validation_data: Optional[np.ndarray] = None
        self.projection_data_labels: Optional[np.ndarray] = None

        self.features_ref_labels: List[str] = []
        self.features_stats: Dict[str, np.ndarray] = {}
        self.features_norm_mean: Optional[np.ndarray] = None
        self.features_norm_range: Optional[np.ndarray] = None
        self.num_features: int = 0

        self.cv = None
        self.cv_dimension: Optional[int] = self.configuration.get("dimension")
        self.cv_labels: List[str] = []
        self.cv_name: Optional[str] = None
        self.cv_range: List[Tuple[float, float]] = []

        self.parent_output_path: Optional[str] = output_path
        self.plumed_files: List[str] = []
        self.temp_model_path: Optional[str] = None

    def __del__(self):
        try:
            if self.temp_model_path and os.path.exists(self.temp_model_path):
                shutil.rmtree(self.temp_model_path, ignore_errors=True)
        except Exception:
            # os/shutil may already be torn down during interpreter shutdown
            pass

    # ------------------------------------------------------------------
    # Persistence: polymorphic factory + zip format
    # ------------------------------------------------------------------
    @classmethod
    def load(cls, model_path: str, output_path: str) -> "CVCalculator":
        """Load any CVCalculator subclass from a self-describing model.zip
        (cf. reference cv_calculator.py:92-149)."""
        from deep_cartograph_tpu.cv import cv_calculators_map

        if not os.path.exists(model_path):
            raise FileNotFoundError(f"Model file not found: {model_path}")
        temp_model_path = os.path.join(output_path, "model")
        unzip_files(model_path, output_path)

        metadata_path = os.path.join(temp_model_path, "metadata.json")
        cv_name = None
        if os.path.exists(metadata_path):
            with open(metadata_path) as fh:
                cv_name = json.load(fh).get("cv_name")
        if not cv_name:
            raise ValueError("Could not determine the CV name from the model file.")

        calculator_class = cv_calculators_map.get(cv_name)
        if not calculator_class:
            raise TypeError(f"Unknown CV calculator name: {cv_name}")
        instance = calculator_class(output_path=output_path)
        instance._load_from_folder(temp_model_path)
        instance.temp_model_path = temp_model_path
        return instance

    def _load_from_folder(self, folder_path: str) -> None:
        metadata_path = os.path.join(folder_path, "metadata.json")
        if os.path.exists(metadata_path):
            with open(metadata_path) as fh:
                metadata = json.load(fh)
            self.cv_dimension = metadata.get("cv_dimension")
            self.cv_name = metadata.get("cv_name")
            self.set_labels()
        else:
            logger.error("Metadata file not found in the model: %s", metadata_path)

        self.model_output_folder = os.path.join(
            self.parent_output_path, self.cv_name, "model"
        )
        if os.path.exists(self.model_output_folder):
            shutil.rmtree(self.model_output_folder)
        shutil.copytree(folder_path, self.model_output_folder)

        with open(os.path.join(self.model_output_folder, "features_labels.txt")) as fh:
            self.features_ref_labels = fh.read().strip().split("\n")
            self.num_features = len(self.features_ref_labels)

        ref_top = os.path.join(self.model_output_folder, "ref_topology.pdb")
        if os.path.exists(ref_top):
            self.ref_topology_path = ref_top
        else:
            self.ref_topology_path = None
            logger.warning("Reference topology file not found in the model.")

    def create_output_folders(self) -> None:
        parent = Path(self.parent_output_path)
        self.output_path = parent / self.cv_name
        self.output_path.mkdir(parents=True, exist_ok=True)
        self.sensitivity_output_folder = self.output_path / "sensitivity_analysis"
        self.sensitivity_output_folder.mkdir(parents=True, exist_ok=True)
        self.training_output_folder = self.output_path / "training"
        self.training_output_folder.mkdir(parents=True, exist_ok=True)
        self.model_output_folder = self.output_path / "model"
        self.model_output_folder.mkdir(parents=True, exist_ok=True)

    # ------------------------------------------------------------------
    # Data loading
    # ------------------------------------------------------------------
    def load_training_data(
        self,
        train_colvars_paths: List[str],
        train_topology_paths: Optional[List[str]] = None,
        ref_topology_path: Optional[str] = None,
        features_list: Optional[List[str]] = None,
    ) -> None:
        self.ref_topology_path = ref_topology_path
        if train_topology_paths is not None and self.ref_topology_path is None:
            self.ref_topology_path = train_topology_paths[0]

        logger.info("Reading training data from colvars files...")
        training_df = create_dataframe_from_files(
            colvars_paths=train_colvars_paths,
            topology_paths=train_topology_paths,
            reference_topology=self.ref_topology_path,
            features_list=features_list,
            file_label="traj_label",
            **self.training_reading_settings,
        )
        self.training_data_labels = training_df.pop("traj_label").to_numpy()
        self.features_ref_labels = training_df.columns.tolist()
        self.num_features = len(self.features_ref_labels)
        logger.info("Number of features: %d", self.num_features)

        from deep_cartograph_tpu.stats.descriptors import feature_statistics

        self.training_data = training_df.to_numpy(dtype=np.float32)
        self.features_stats = feature_statistics(self.training_data)
        self.features_norm_mean, self.features_norm_range = (
            self.prepare_normalization()
        )

    def load_validation_data(
        self,
        val_colvars_paths: List[str],
        val_topology_paths: Optional[List[str]] = None,
        ref_topology_path: Optional[str] = None,
        features_list: Optional[List[str]] = None,
    ) -> None:
        if val_topology_paths is not None and ref_topology_path is None:
            ref_topology_path = val_topology_paths[0]
        logger.info("Reading validation data from colvars files...")
        validation_df = create_dataframe_from_files(
            colvars_paths=val_colvars_paths,
            topology_paths=val_topology_paths,
            reference_topology=ref_topology_path,
            features_list=features_list,
            # keep per-file labels so time-lagged subclasses can avoid
            # pairing frames across trajectory boundaries
            file_label="traj_label",
            **self.training_reading_settings,
        )
        self.validation_data_labels = validation_df.pop(
            "traj_label"
        ).to_numpy()
        self.validation_data = validation_df.to_numpy(dtype=np.float32)

    # ------------------------------------------------------------------
    # Normalization contract (cf. reference cv_calculator.py:308-363)
    # ------------------------------------------------------------------
    def prepare_normalization(self) -> Tuple[np.ndarray, np.ndarray]:
        """normalized = (feature - mean) / range, with four modes:
        None / mean_std / min_max_range1 ([0,1]) / min_max_range2 ([-1,1])."""
        stats = self.features_stats
        if self.feats_norm_mode is None:
            means = np.zeros(len(stats["mean"]))
            ranges = np.ones(len(stats["mean"]))
        elif self.feats_norm_mode == "mean_std":
            means = stats["mean"].copy()
            ranges = stats["std"].copy()
        elif self.feats_norm_mode == "min_max_range1":
            means = stats["min"].copy()
            ranges = stats["max"] - stats["min"]
        elif self.feats_norm_mode == "min_max_range2":
            means = (stats["min"] + stats["max"]) / 2
            ranges = (stats["max"] - stats["min"]) / 2
        else:
            raise ValueError(
                f"Normalization mode {self.feats_norm_mode} not recognized."
            )
        # Guard degenerate ranges (cf. sanitize_ranges, cv_calculator.py:329-337)
        small = np.abs(ranges) < 1e-8
        if small.any():
            logger.warning(
                "%d feature ranges are close to zero; set to 1.0.", small.sum()
            )
            ranges = np.where(small, 1.0, ranges)
        return means, ranges

    # ------------------------------------------------------------------
    # Run template (cf. reference cv_calculator.py:366-414)
    # ------------------------------------------------------------------
    def run(self, cv_dimension: Optional[int] = None) -> Optional[pd.DataFrame]:
        if self.training_data is None:
            logger.error("Training data not loaded. Cannot compute CV.")
            return None
        self.create_output_folders()
        if cv_dimension:
            self.cv_dimension = cv_dimension

        # Small datasets: run the whole CV computation (training, projection,
        # sensitivity — many distinct XLA programs) on the host CPU, where a
        # remote accelerator's per-program compile latency would dominate.
        from deep_cartograph_tpu.utils.device import maybe_cpu

        with maybe_cpu(float(np.asarray(self.training_data).size) * 100):
            self.compute_cv()
            self.set_labels()

            if self.cv is None:
                return None
            self.normalize_cv()
            projection = self.project_data(
                self.training_data, normalize_data=False
            )
            self.save_model()
            self.sensitivity_analysis()
        return pd.DataFrame(np.asarray(projection), columns=self.cv_labels)

    # Abstract surface -------------------------------------------------
    @abstractmethod
    def compute_cv(self) -> None: ...

    @abstractmethod
    def save_weights(self, weights_path: str) -> None: ...

    @abstractmethod
    def get_cv_parameters(self) -> Dict: ...

    @abstractmethod
    def get_cv_type(self) -> str: ...

    @abstractmethod
    def project_data(
        self, data: np.ndarray, normalize_data: bool = True
    ) -> np.ndarray: ...

    @abstractmethod
    def normalize_cv(self) -> None: ...

    @abstractmethod
    def sensitivity_analysis(self) -> None: ...

    def cv_ready(self) -> bool:
        return self.cv is not None

    # ------------------------------------------------------------------
    def save_model(self) -> None:
        """Common model.zip content (cf. reference cv_calculator.py:436-452)."""
        metadata = {"cv_name": self.cv_name, "cv_dimension": self.cv_dimension}
        with open(os.path.join(self.model_output_folder, "metadata.json"), "w") as fh:
            json.dump(metadata, fh)
        with open(
            os.path.join(self.model_output_folder, "features_labels.txt"), "w"
        ) as fh:
            fh.write("\n".join(self.features_ref_labels) + "\n")
        if self.ref_topology_path is not None:
            create_pdb(
                self.ref_topology_path,
                os.path.join(self.model_output_folder, "ref_topology.pdb"),
            )

    def _zip_and_clean_model(self) -> str:
        model_path = os.path.join(self.output_path, "model.zip")
        zip_files(model_path, str(self.model_output_folder))
        shutil.rmtree(self.model_output_folder)
        logger.info("Model saved to %s", model_path)
        return model_path

    # ------------------------------------------------------------------
    def project_colvars(
        self,
        colvars_paths: Union[List[str], str],
        topology_paths: Union[List[str], str],
    ) -> Optional[pd.DataFrame]:
        """Project colvars files onto the CV space
        (cf. reference cv_calculator.py:478-526)."""
        if self.ref_topology_path is None:
            # The reference bails out entirely here (cv_calculator.py:501-503).
            # Translation is impossible without a reference topology, but a
            # colvars-only workflow whose feature names already match needs
            # none — proceed by name in that case instead of failing.
            if topology_paths:
                logger.warning(
                    "Reference topology not set. Make sure the colvars "
                    "file matches the training data."
                )
                return None
            logger.info(
                "No reference topology: projecting by feature name "
                "(no cross-topology translation)."
            )
        # Larger-than-disk-RAM projection inputs (long production
        # trajectories): project block-by-block instead of materializing
        # the (frames, features) matrix — valid for every model type here
        # (linear matmul, per-batch nets, and UMAP's per-query transform
        # are all row-independent). Same trigger knob as training
        # streaming; no reading window applies to projection.
        from deep_cartograph_tpu.io.colvars import translation_is_identity

        if translation_is_identity(
            topology_paths, self.ref_topology_path
        ) and self._should_stream_projection(colvars_paths):
            return self._project_colvars_streaming(colvars_paths)
        colvars_df = create_dataframe_from_files(
            colvars_paths=colvars_paths,
            topology_paths=topology_paths,
            reference_topology=self.ref_topology_path,
            features_list=self.features_ref_labels,
            file_label="traj_label",
        )
        self.projection_data_labels = colvars_df.pop("traj_label").to_numpy()
        data = colvars_df.to_numpy(dtype=np.float32)
        # Projection is low-intensity over HOST data (a few hundred flops
        # per uploaded element at most): route by transfer cost, not just
        # element count — through a slow tunnel the host matmul wins.
        from deep_cartograph_tpu.utils.device import (
            SMALL_WORK_ELEMENTS,
            maybe_cpu_for_host_data,
        )

        with maybe_cpu_for_host_data(
            float(data.size),
            data.nbytes,
            host_rate=2e7,  # ~a few GFLOP/s host / ~100 flops per element
            threshold=SMALL_WORK_ELEMENTS / 100,
        ):
            projected = self.project_data(data)
        return pd.DataFrame(np.asarray(projected), columns=self.cv_labels)

    def _should_stream_projection(self, colvars_paths) -> bool:
        from deep_cartograph_tpu.io.colvars import should_stream_colvars

        # Same knob as training streaming: configuration `streaming`
        # (true/on forces, false/off disables, auto = size threshold over
        # the FULL file width — the in-memory reader materializes every
        # column before selecting).
        return should_stream_colvars(
            colvars_paths, self.configuration.get("streaming", "auto")
        )

    def _project_colvars_streaming(
        self, colvars_paths
    ) -> Optional[pd.DataFrame]:
        from deep_cartograph_tpu.io.colvars import iter_features_chunks

        if isinstance(colvars_paths, str):
            colvars_paths = [colvars_paths]
        logger.info(
            "Streaming projection: %d features over %d file(s) "
            "(bounded-memory blocks).",
            self.num_features, len(colvars_paths),
        )
        parts: List[np.ndarray] = []
        file_rows: List[int] = []
        for path in colvars_paths:
            rows_here = 0
            for blk in iter_features_chunks(
                path,
                feature_names=self.features_ref_labels,
                nan_check=True,
            ):
                rows_here += blk.shape[0]
                parts.append(np.asarray(self.project_data(blk), np.float32))
            file_rows.append(rows_here)
        if not parts:
            # same hard exit as the in-memory reader
            # (create_dataframe_from_files)
            logger.error("The resulting dataframe is empty.")
            import sys

            sys.exit(1)
        self.projection_data_labels = np.repeat(
            np.arange(len(file_rows)), file_rows
        )
        return pd.DataFrame(
            np.concatenate(parts, axis=0), columns=self.cv_labels
        )

    def set_labels(self) -> None:
        self.cv_labels = [
            f"{cv_components_map[self.cv_name]} {i + 1}"
            for i in range(self.cv_dimension)
        ]

    # ------------------------------------------------------------------
    # PLUMED deployment files (cf. reference cv_calculator.py:545-681)
    # ------------------------------------------------------------------
    def write_plumed_files(
        self,
        topology: Optional[str],
        output_folder: str,
        waypoint_structures: Optional[List[str]] = None,
    ) -> None:
        if topology is None:
            logger.warning("Topology not provided. Skipping PLUMED files creation.")
            return

        from deep_cartograph_tpu.features.translator import Translator
        from deep_cartograph_tpu.geom.structure import (
            create_plumed_rmsd_template,
            create_rmsd_waypoint_reference,
        )
        from deep_cartograph_tpu.plumed.builder import (
            ComputeCVBuilder,
            ComputeEnhancedSamplingBuilder,
        )
        from deep_cartograph_tpu.utils.common import remove_files

        topology_name = Path(topology).name
        self.plumed_files = []

        plumed_topology_path = os.path.join(output_folder, "plumed_topology.pdb")
        create_pdb(topology, plumed_topology_path)
        self.plumed_files.append(plumed_topology_path)

        ref_plumed_topology_path = os.path.join(
            output_folder, "ref_plumed_topology.pdb"
        )
        create_pdb(self.ref_topology_path, ref_plumed_topology_path)
        features_list = Translator(
            ref_plumed_topology_path, plumed_topology_path, self.features_ref_labels
        ).run()
        if None in features_list:
            failed = [
                self.features_ref_labels[i]
                for i, f in enumerate(features_list)
                if f is None
            ]
            logger.error(
                "Failed to translate features to topology %s: %s. Skipping "
                "PLUMED files creation.",
                topology_name,
                failed,
            )
            return

        need_fit = any(f.startswith("coord") for f in features_list)
        fit_template_path = None
        if need_fit:
            fit_template_path = os.path.join(output_folder, "fit_template.pdb")
            create_plumed_rmsd_template(topology, fit_template_path)
            self.plumed_files.append(fit_template_path)

        if self.get_cv_type() == "non-linear":
            self.weights_path = os.path.join(
                output_folder, f"{self.cv_name}_weights.pt"
            )
            self.save_weights(self.weights_path)
            self.plumed_files.append(self.weights_path)

        plumed_input_path = os.path.join(
            output_folder, f"plumed_input_{self.cv_name}.dat"
        )
        self.plumed_files.append(plumed_input_path)
        builder_args = {
            "plumed_input_path": plumed_input_path,
            "topology_path": plumed_topology_path,
            "features_list": features_list,
            "traj_stride": 1,
            "cv_type": self.get_cv_type(),
            "cv_params": self.get_cv_parameters(),
            "fit_template_path": fit_template_path,
        }
        ComputeCVBuilder(**builder_args).build(f"{self.cv_name}_out.dat")

        unbiased_zip = os.path.join(
            output_folder, f"plumed_{self.cv_name}_unbiased.zip"
        )
        zip_files(unbiased_zip, *self.plumed_files)
        os.remove(plumed_input_path)
        self.plumed_files.remove(plumed_input_path)

        if not self.bias:
            # Models loaded from a zip carry no bias configuration; the
            # unbiased input above is still produced (the reference errors
            # out here instead).
            logger.warning(
                "No bias configuration on this calculator; skipping the "
                "biased PLUMED input."
            )
            remove_files(*self.plumed_files)
            os.remove(ref_plumed_topology_path)
            return

        rmsd_reference_path = None
        if self.bias.get("add_rmsd_restraint"):
            if waypoint_structures:
                rmsd_reference_path = os.path.join(
                    output_folder, "rmsd_restraint_reference.pdb"
                )
                create_rmsd_waypoint_reference(
                    waypoint_structures,
                    plumed_topology_path,
                    rmsd_reference_path,
                    self.bias.get("align_waypoint_structures", True),
                )
                self.plumed_files.append(rmsd_reference_path)
            else:
                logger.warning(
                    "No waypoint structures provided for RMSD restraint guide. "
                    "Skipping RMSD restraint."
                )

        method = self.bias["method"]
        plumed_input_path = os.path.join(
            output_folder, f"plumed_input_{self.cv_name}_{method}.dat"
        )
        self.plumed_files.append(plumed_input_path)
        builder_args.update(
            {
                "sampling_method": method,
                "sampling_params": self.bias["args"],
                "plumed_input_path": plumed_input_path,
                "rmsd_restraint_reference_path": rmsd_reference_path,
                "rmsd_restraint_k": self.bias.get("rmsd_restraint_k"),
                "rmsd_restraint_eq": self.bias.get("rmsd_restraint_eq"),
            }
        )
        ComputeEnhancedSamplingBuilder(**builder_args).build(
            f"{self.cv_name}_{method}_out.dat"
        )
        biased_zip = os.path.join(output_folder, f"plumed_{self.cv_name}_biased.zip")
        zip_files(biased_zip, *self.plumed_files)

        remove_files(*self.plumed_files)
        os.remove(ref_plumed_topology_path)

    # ------------------------------------------------------------------
    def compute_atom_sensitivities(
        self,
        feature_labels: List[str],
        feature_sensitivities: np.ndarray,
    ) -> Dict[int, float]:
        """Per-atom sensitivity = max sensitivity over features touching the
        atom (cf. reference cv_calculator.py:691-723)."""
        from deep_cartograph_tpu.features.grammar import resolve_entity_index
        from deep_cartograph_tpu.io.topology import Topology

        topology = Topology.from_file(self.ref_topology_path)
        per_atom: Dict[int, float] = {}
        for feature, sensitivity in zip(feature_labels, feature_sensitivities):
            entities = feature.split("-")[1:]
            if entities:
                entities[-1] = entities[-1].split(".")[0]
            for entity in entities:
                if entity.startswith("center_"):
                    continue
                if entity.startswith("@") and entity[1:].split("_")[0] in (
                    "phi",
                    "psi",
                ):
                    continue
                try:
                    idx = resolve_entity_index(entity, topology)
                except (ValueError, KeyError):
                    continue
                per_atom[idx] = max(per_atom.get(idx, -np.inf), float(sensitivity))
        return per_atom

    def _save_sensitivity(
        self, feature_labels: List[str], sensitivities: np.ndarray, folder: str
    ) -> None:
        """Common sensitivity output: CSV + bar plot + structure mapping."""
        from deep_cartograph_tpu.figures.plots import plot_sensitivity_results
        from deep_cartograph_tpu.geom.structure import map_sensitivity_to_structure

        os.makedirs(folder, exist_ok=True)
        df = pd.DataFrame({"sensitivity": sensitivities}, index=feature_labels)
        df.to_csv(os.path.join(folder, "sensitivity_analysis.csv"))
        results = {
            "feature_names": list(feature_labels),
            "sensitivity": {"Dataset": np.asarray(sensitivities)},
        }
        plot_sensitivity_results(results, modes=["barh"], output_folder=folder)
        if self.ref_topology_path is None:
            # Colvars-only training (no topology given): per-atom mapping
            # needs a structure; the per-feature CSV/plot above still land.
            return
        per_atom = self.compute_atom_sensitivities(
            list(feature_labels), np.asarray(sensitivities)
        )
        if per_atom:
            map_sensitivity_to_structure(per_atom, self.ref_topology_path, folder)

    # Getters ------------------------------------------------------------
    def get_labels(self) -> List[str]:
        return self.cv_labels

    def get_cv_dimension(self) -> int:
        return self.cv_dimension

    def get_range(self) -> List[Tuple[float, float]]:
        return self.cv_range
