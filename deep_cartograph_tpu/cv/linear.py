"""Linear CV calculators: PCA, TICA, HTICA — on-device linear algebra.

Parity with the reference LinearCalculator hierarchy
(deep_cartograph/modules/cv_learning/cv_calculator.py:749-1047, 2174-2384):
in-place normalization of training data, weights-matrix CV, min-max CV
normalization to [-1, 1], |weights| sensitivity, .npy persistence. The
eigen-solvers run in XLA (see cv/tica_math.py) instead of sklearn/mlcolvar.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from deep_cartograph_tpu.cv.base import CVCalculator, cv_names_map
from deep_cartograph_tpu.cv.tica_math import (
    create_timelagged_dataset_multi,
    split_subspaces,
    tica,
)

logger = logging.getLogger(__name__)


class LinearCalculator(CVCalculator):
    """Base class for linear CV calculators (weights matrix = the CV)."""

    def __init__(self, configuration=None, output_path=None):
        super().__init__(configuration, output_path)
        self.cv: Optional[np.ndarray] = None
        self.weights_path: Optional[str] = None
        self.cv_stats: Dict[str, np.ndarray] = {}
        self.cv_norm_mean: Optional[np.ndarray] = None
        self.cv_norm_range: Optional[np.ndarray] = None

    # -- persistence ----------------------------------------------------
    def _load_from_folder(self, folder_path: str) -> None:
        super()._load_from_folder(folder_path)
        m = self.model_output_folder
        self.cv = np.load(os.path.join(m, "cv_weights.npy"))
        self.cv_norm_mean = np.load(os.path.join(m, "cv_norm_mean.npy"))
        self.cv_norm_range = np.load(os.path.join(m, "cv_norm_range.npy"))
        self.features_norm_mean = np.load(os.path.join(m, "features_norm_mean.npy"))
        self.features_norm_range = np.load(os.path.join(m, "features_norm_range.npy"))
        # cv_stats are not stored directly but are recoverable from the saved
        # normalization parameters (mean = (max+min)/2, range = (max-min)/2);
        # the PLUMED assembler needs them for the COMBINE offset/scale.
        self.cv_stats = {
            "min": (self.cv_norm_mean - self.cv_norm_range).astype(np.float64),
            "max": (self.cv_norm_mean + self.cv_norm_range).astype(np.float64),
        }

    def save_weights(self, weights_path: str) -> None:
        np.save(weights_path, self.cv)

    def save_model(self) -> None:
        super().save_model()
        if self.cv is None:
            raise ValueError("No Linear CV weights to save.")
        if self.cv_norm_mean is None or self.cv_norm_range is None:
            raise ValueError("CV normalization parameters have not been computed.")
        if self.features_norm_mean is None or self.features_norm_range is None:
            raise ValueError(
                "Features normalization parameters have not been computed."
            )
        m = self.model_output_folder
        self.save_weights(os.path.join(m, "cv_weights.npy"))
        np.save(os.path.join(m, "cv_norm_mean.npy"), self.cv_norm_mean)
        np.save(os.path.join(m, "cv_norm_range.npy"), self.cv_norm_range)
        np.save(os.path.join(m, "features_norm_mean.npy"), self.features_norm_mean)
        np.save(os.path.join(m, "features_norm_range.npy"), self.features_norm_range)
        self._zip_and_clean_model()

    # -- data -----------------------------------------------------------
    def load_training_data(
        self,
        train_colvars_paths,
        train_topology_paths=None,
        ref_topology_path=None,
        features_list=None,
    ) -> None:
        super().load_training_data(
            train_colvars_paths, train_topology_paths, ref_topology_path,
            features_list,
        )
        # Linear models consume pre-normalized data (non-linear models embed
        # the normalization; cf. reference cv_calculator.py:792-804).
        self.training_data = self._normalize(self.training_data)

    def _normalize(self, data: np.ndarray) -> np.ndarray:
        return (
            (data - self.features_norm_mean.astype(np.float32))
            / self.features_norm_range.astype(np.float32)
        ).astype(np.float32)

    # -- projection / normalization --------------------------------------
    def get_cv_parameters(self) -> Dict:
        return {
            "cv_name": self.cv_name,
            "cv_dimension": self.cv_dimension,
            "features_norm_mode": self.feats_norm_mode,
            "features_norm_mean": self.features_norm_mean,
            "features_norm_range": self.features_norm_range,
            "cv_stats": self.cv_stats,
            "weights": self.cv,
        }

    def get_cv_type(self) -> str:
        return "linear"

    def project_data(
        self, data: np.ndarray, normalize_data: bool = True
    ) -> np.ndarray:
        if self.cv is None:
            raise ValueError("CV has not been computed. Cannot project data.")
        arr = np.asarray(data, np.float32)
        if normalize_data:
            if self.features_norm_mean is None:
                raise ValueError("Feature normalization parameters missing.")
            arr = self._normalize(arr)
        projected = np.asarray(
            jnp.asarray(arr) @ jnp.asarray(self.cv, jnp.float32)
        )
        if self.cv_norm_mean is None or self.cv_norm_range is None:
            raise ValueError("CV normalization parameters missing.")
        return (projected - self.cv_norm_mean) / self.cv_norm_range

    def normalize_cv(self) -> None:
        """Min-max normalization of projected training data to [-1, 1]
        (cf. reference cv_calculator.py:974-991)."""
        if self.training_data is None:
            raise ValueError("Training data not loaded.")
        projected = np.asarray(
            jnp.asarray(self.training_data) @ jnp.asarray(self.cv, jnp.float32)
        )
        self.cv_stats = {
            "min": projected.min(axis=0).astype(np.float64),
            "max": projected.max(axis=0).astype(np.float64),
        }
        self.cv_norm_mean = (self.cv_stats["max"] + self.cv_stats["min"]) / 2
        self.cv_norm_range = (self.cv_stats["max"] - self.cv_stats["min"]) / 2
        # Degenerate component (constant projection, e.g. a dimension past
        # the data rank): a zero range would emit inf/NaN CVs and poison
        # the persisted norm params + PLUMED COMBINE scale. Same clamp as
        # NonLinear.normalize_cv.
        self.cv_norm_range = np.where(
            np.abs(self.cv_norm_range) < 1e-12, 1.0, self.cv_norm_range
        )

    def sensitivity_analysis(self) -> None:
        """|weight| per feature per CV dimension
        (cf. reference cv_calculator.py:993-1047)."""
        sens = np.abs(np.asarray(self.cv))
        for ci in range(sens.shape[1]):
            folder = os.path.join(
                str(self.sensitivity_output_folder), f"sensitivity_analysis_{ci + 1}"
            )
            order = np.argsort(sens[:, ci])
            labels = [self.features_ref_labels[i] for i in order]
            self._save_sensitivity(labels, sens[order, ci], folder)

    def _lagged_blocks(self) -> tuple:
        """Time-lagged pairs built per trajectory block so pairs never cross
        trajectory boundaries (improves on the reference, which pairs across
        concatenated files; cf. cv_calculator.py:2241-2247)."""
        lag = self.configuration.get("lag_time", 1)
        labels = self.training_data_labels
        if labels is None:
            blocks = [self.training_data]
        else:
            blocks = [
                self.training_data[labels == lab] for lab in np.unique(labels)
            ]
        return create_timelagged_dataset_multi(blocks, lag)


class PCACalculator(LinearCalculator):
    """Principal component analysis (cf. reference cv_calculator.py:2174-2215).

    Covariance eigendecomposition in XLA; sign convention: first weight of
    each component positive, matching the reference.
    """

    def __init__(self, configuration=None, output_path=None):
        super().__init__(configuration, output_path)
        self.cv_name = "pca"
        logger.info("Creating %s Calculator ...", cv_names_map[self.cv_name])

    def compute_cv(self) -> None:
        if self.training_data is None:
            logger.error("No training data available to compute PCA.")
            return
        x = jnp.asarray(self.training_data)
        mu = jnp.mean(x, axis=0)
        xc = x - mu
        cov = (xc.T @ xc) / (x.shape[0] - 1)
        evals, evecs = jnp.linalg.eigh(cov)
        # ascending -> take top cv_dimension, descending
        components = np.array(evecs[:, ::-1][:, : self.cv_dimension])
        for i in range(self.cv_dimension):
            if components[0, i] < 0:
                components[:, i] = -components[:, i]
        self.cv = components
        self.explained_variance_ = np.asarray(evals[::-1][: self.cv_dimension])


class TICACalculator(LinearCalculator):
    """Time-lagged independent component analysis
    (cf. reference cv_calculator.py:2217-2267)."""

    def __init__(self, configuration=None, output_path=None):
        super().__init__(configuration, output_path)
        self.cv_name = "tica"
        self.x_t: Optional[np.ndarray] = None
        self.x_lag: Optional[np.ndarray] = None
        logger.info("Creating %s Calculator ...", cv_names_map[self.cv_name])

    def load_training_data(self, *args, **kwargs) -> None:
        super().load_training_data(*args, **kwargs)
        self.x_t, self.x_lag = self._lagged_blocks()

    def compute_cv(self) -> None:
        import jax

        reg = self.configuration.get("tica_regularization", 1e-6)
        try:
            if len(jax.devices()) > 1 and self.x_t.shape[0] >= 4 * len(
                jax.devices()
            ):
                # Frame-sharded covariance accumulation over the mesh
                from deep_cartograph_tpu.cv.tica_math import tica_sharded

                self.eigenvalues_, evecs = tica_sharded(
                    self.x_t, self.x_lag, self.cv_dimension, reg=reg
                )
            else:
                self.eigenvalues_, evecs = tica(
                    self.x_t, self.x_lag, self.cv_dimension, reg=reg
                )
        except Exception as exc:
            logger.error("TICA could not be computed. Error message: %s", exc)
            return
        self.cv = evecs


class HTICACalculator(LinearCalculator):
    """Hierarchical TICA (Perez-Hernandez & Noe 2016): per-subspace TICA ->
    block-diagonal transform -> second-level TICA on concatenated projections
    (cf. reference cv_calculator.py:2269-2384). Subspace solves are
    independent and batch naturally on device; at scale the feature axis
    shards across the mesh.
    """

    def __init__(self, configuration=None, output_path=None):
        super().__init__(configuration, output_path)
        self.cv_name = "htica"
        self.num_subspaces = self.configuration.get("num_subspaces")
        self.subspaces_dimension = self.configuration.get("subspaces_dimension")
        self.x_t: Optional[np.ndarray] = None
        self.x_lag: Optional[np.ndarray] = None
        logger.info("Creating %s Calculator ...", cv_names_map[self.cv_name])

    def load_training_data(self, *args, **kwargs) -> None:
        super().load_training_data(*args, **kwargs)
        self.x_t, self.x_lag = self._lagged_blocks()

    def compute_cv(self) -> None:
        reg = self.configuration.get("tica_regularization", 1e-6)
        try:
            blocks = split_subspaces(self.num_features, self.num_subspaces)
        except ValueError as exc:
            logger.error("%s", exc)
            return

        level1: List[np.ndarray] = []
        proj_t: List[np.ndarray] = []
        proj_lag: List[np.ndarray] = []
        for cols in blocks:
            sub_dim = min(self.subspaces_dimension, len(cols))
            try:
                _, evecs = tica(
                    self.x_t[:, cols], self.x_lag[:, cols], sub_dim, reg=reg
                )
            except Exception as exc:
                logger.error("TICA could not be computed. Error message: %s", exc)
                return
            level1.append(evecs)
            proj_t.append(self.x_t[:, cols] @ evecs)
            proj_lag.append(self.x_lag[:, cols] @ evecs)

        # Block-diagonal level-1 transform (features -> level-1 TICA space)
        total_cols = sum(b.shape[1] for b in level1)
        transform = np.zeros((self.num_features, total_cols), np.float32)
        r = c = 0
        for b in level1:
            transform[r : r + b.shape[0], c : c + b.shape[1]] = b
            r += b.shape[0]
            c += b.shape[1]

        z_t = np.concatenate(proj_t, axis=1)
        z_lag = np.concatenate(proj_lag, axis=1)
        try:
            self.eigenvalues_, level2 = tica(z_t, z_lag, self.cv_dimension, reg=reg)
        except Exception as exc:
            logger.error("TICA could not be computed. Error message: %s", exc)
            return
        self.cv = transform @ level2
