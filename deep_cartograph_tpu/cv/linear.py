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
        # larger-than-RAM training sets (see load_training_data)
        self._streaming = False
        self._stream_paths: Optional[List[str]] = None
        self._stream_projection: Optional[np.ndarray] = None

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
        # Larger-than-RAM training sets: every linear calculator can stream
        # from disk instead of materializing (the reference OOMs here,
        # colvars.py:322-473). See _should_stream for the trigger.
        if self._should_stream(
            train_colvars_paths, train_topology_paths, features_list,
            ref_topology_path,
        ):
            if train_topology_paths and ref_topology_path is None:
                ref_topology_path = train_topology_paths[0]
            self._setup_streaming(
                train_colvars_paths, ref_topology_path, features_list
            )
            return
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

    # -- larger-than-RAM training sets: stream from disk -----------------
    # The reference materializes the full feature matrix in host RAM
    # (colvars.py:322-473) and OOMs past it. Every linear calculator can
    # instead stream the colvars files in bounded blocks
    # (io.colvars.iter_features_chunks) with the solve done on streaming
    # covariances, so the frame-count ceiling is disk, not RAM.
    # Triggered by configuration key `streaming: true`, or automatically
    # when the estimated fp32 matrix exceeds DEEP_CARTO_STREAM_BYTES
    # (default 4 GiB; 0 disables auto).
    def _should_stream(
        self, paths, topology_paths, features_list=None,
        ref_topology_path=None,
    ) -> bool:
        from deep_cartograph_tpu.io.colvars import (
            should_stream_colvars,
            translation_is_identity,
        )

        mode = self.configuration.get("streaming", "auto")
        if not translation_is_identity(topology_paths, ref_topology_path):
            # distinct topologies: per-file feature translation really is
            # needed, and the streaming reader selects by untranslated name
            if mode in (True, "on"):
                logger.warning(
                    "streaming=true requested but the inputs need "
                    "cross-topology translation; falling back to "
                    "in-memory loading."
                )
            return False
        if isinstance(paths, str):
            paths = [paths]
        result = should_stream_colvars(paths, mode)
        if mode in (True, "on") and not result:
            logger.warning(
                "streaming=true requested but the inputs are not PLUMED "
                "files; falling back to in-memory loading."
            )
        return result

    def _setup_streaming(
        self, train_colvars_paths, ref_topology_path, features_list
    ) -> None:
        from deep_cartograph_tpu.io.colvars import read_column_names

        if isinstance(train_colvars_paths, str):
            train_colvars_paths = [train_colvars_paths]
        self._streaming = True
        self._stream_paths = list(train_colvars_paths)
        self.ref_topology_path = ref_topology_path
        self.features_ref_labels = list(
            features_list
            or read_column_names(self._stream_paths[0], features_only=True)
        )
        self.num_features = len(self.features_ref_labels)
        if self.num_features == 0:
            raise ValueError(
                f"No feature columns found in {self._stream_paths[0]}."
            )
        logger.info(
            "%s streaming mode: %d features over %d file(s) "
            "(bounded-memory fit).",
            self.cv_name, self.num_features, len(self._stream_paths),
        )
        # One streaming pass: normalization statistics, per-file row counts
        # (training_data_labels, so the tool's per-trajectory outputs work
        # exactly as in-memory), and the NaN screen the in-memory loader
        # performs (create_dataframe_from_files' "Clean your data!").
        cnt = 0
        s1 = np.zeros(self.num_features, np.float64)
        s2 = np.zeros(self.num_features, np.float64)
        mn = np.full(self.num_features, np.inf, np.float64)
        mx = np.full(self.num_features, -np.inf, np.float64)
        file_rows: List[int] = []
        for path in self._stream_paths:
            rows_here = 0
            for blk in self._file_chunks(path):
                b64 = blk.astype(np.float64)
                rows_here += b64.shape[0]
                s1 += b64.sum(axis=0)
                s2 += (b64 * b64).sum(axis=0)
                np.minimum(mn, b64.min(axis=0), out=mn)
                np.maximum(mx, b64.max(axis=0), out=mx)
            file_rows.append(rows_here)
        cnt = sum(file_rows)
        if cnt == 0:
            raise ValueError(
                f"No rows read from colvars files {self._stream_paths} "
                "with the configured reading window."
            )
        self.training_data_labels = np.repeat(
            np.arange(len(file_rows)), file_rows
        )
        mean = s1 / cnt
        var = np.maximum(s2 / cnt - mean * mean, 0.0)
        self.features_stats = {
            "mean": mean,
            "std": np.sqrt(var),
            "min": mn,
            "max": mx,
        }
        self.features_norm_mean, self.features_norm_range = (
            self.prepare_normalization()
        )

    def _file_chunks(self, path: str):
        """Bounded-memory chunk stream over ONE colvars file, honoring the
        configured reading window (same per-file semantics as
        load_dataframe). Chunk rows auto-size from the file's FULL width
        (one parsed slab stays within the block budget regardless of how
        narrow the feature selection is); NaNs anywhere in the file raise
        like the in-memory loader."""
        from deep_cartograph_tpu.io.colvars import iter_features_chunks

        read = self.training_reading_settings
        yield from iter_features_chunks(
            path,
            feature_names=self.features_ref_labels,
            start=read.get("start", 0),
            stop=read.get("stop", None),
            stride=max(read.get("stride", 1), 1),
            nan_check=True,
        )

    def _stream_blocks(self, with_breaks: bool = False):
        """Block stream over all training files in order. With
        ``with_breaks``, a None sentinel separates files so lag pairs
        never cross them."""
        first = True
        for path in self._stream_paths:
            if not first and with_breaks:
                yield None
            first = False
            yield from self._file_chunks(path)

    def _normalized_stream(self, with_breaks: bool = False, pad_to: int = 0):
        mean = self.features_norm_mean.astype(np.float32)
        rng = self.features_norm_range.astype(np.float32)
        for blk in self._stream_blocks(with_breaks=with_breaks):
            if blk is None:
                yield None
                continue
            nb = (blk - mean) / rng
            if pad_to > nb.shape[1]:
                nb = np.pad(nb, ((0, 0), (0, pad_to - nb.shape[1])))
            yield nb

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
        if self._streaming:
            # streaming pass: project every block, track min/max; keep the
            # (frames, cv_dim) projection — it is tiny — for run()'s output.
            projs = [
                np.asarray(blk @ self.cv.astype(np.float32))
                for blk in self._normalized_stream()
            ]
            projected = np.concatenate(projs, axis=0)
            self._set_cv_stats_from_projection(projected)
            self._stream_projection = projected
            return
        if self.training_data is None:
            raise ValueError("Training data not loaded.")
        projected = np.asarray(
            jnp.asarray(self.training_data) @ jnp.asarray(self.cv, jnp.float32)
        )
        self._set_cv_stats_from_projection(projected)

    def _set_cv_stats_from_projection(self, projected: np.ndarray) -> None:
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

    def run(self, cv_dimension=None):
        if not self._streaming:
            return super().run(cv_dimension)
        # Streaming variant of the base run() template: identical steps,
        # but the training data never materializes — the projection
        # dataframe comes from normalize_cv's streaming pass, and nothing
        # is routed to the host CPU (streaming implies production scale).
        import pandas as pd

        self.create_output_folders()
        if cv_dimension:
            self.cv_dimension = cv_dimension
        self.compute_cv()
        self.set_labels()
        if self.cv is None:
            return None
        self.normalize_cv()
        projection = (
            self._stream_projection - self.cv_norm_mean
        ) / self.cv_norm_range
        self._stream_projection = None
        self.save_model()
        self.sensitivity_analysis()
        return pd.DataFrame(
            np.asarray(projection, np.float32), columns=self.cv_labels
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
        if self._streaming:
            self._compute_cv_streaming()
            return
        if self.training_data is None:
            logger.error("No training data available to compute PCA.")
            return
        x = jnp.asarray(self.training_data)
        mu = jnp.mean(x, axis=0)
        xc = x - mu
        cov = (xc.T @ xc) / (x.shape[0] - 1)
        self._finish_pca(cov)

    def _compute_cv_streaming(self) -> None:
        """Streaming covariance: per-block X^T X on device, f64 host
        accumulation (immune to mean-dominated f32 cancellation), then the
        same eigendecomposition as the in-memory path."""
        n = 0
        shift = None  # first-block mean: keeps the f32 device product
        # O(variance) even for mean-dominated raw features
        # (features_normalization: None) — same trick as StreamingHTICA.
        s1 = np.zeros(self.num_features, np.float64)
        s2 = np.zeros((self.num_features, self.num_features), np.float64)
        for blk in self._normalized_stream():
            x = jnp.asarray(blk)
            if shift is None:
                shift = jnp.mean(x, axis=0)
            xs = x - shift
            n += blk.shape[0]
            s1 += np.asarray(jnp.sum(xs, axis=0), np.float64)
            s2 += np.asarray(xs.T @ xs, np.float64)
        if n < 2:
            logger.error("No training data available to compute PCA.")
            return
        mu = s1 / n  # residual mean after the shift
        cov = (s2 - n * np.outer(mu, mu)) / (n - 1)
        self._finish_pca(jnp.asarray(cov, jnp.float32))

    def _finish_pca(self, cov) -> None:
        from deep_cartograph_tpu.cv.htica_stream import (
            _EIGH_HOST_DIM_THRESHOLD,
            host_topk_eigh,
        )

        # Large dense eigh routes to the host (a D>256 eigh is milliseconds
        # anywhere but its accelerator program is enormous to compile
        # through a remote service — see htica_stream); the host solve
        # goes straight to LAPACK's subset driver for the top
        # cv_dimension pairs only.
        if int(cov.shape[-1]) > _EIGH_HOST_DIM_THRESHOLD:
            evals, evecs = host_topk_eigh(np.asarray(cov),
                                          self.cv_dimension)
            evals, evecs = jnp.asarray(evals), jnp.asarray(evecs)
        else:
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
        if not self._streaming:
            self.x_t, self.x_lag = self._lagged_blocks()

    def _compute_cv_streaming(self) -> None:
        """Streaming TICA = StreamingHTICA with ONE subspace spanning all
        features: level 1 solves the full-space time-lagged problem on
        streamed covariances (same estimator as tica_math.tica), and the
        level-2 re-solve in the projected space is an identity rotation of
        the already-independent components — eigenvalues and the spanned
        subspace are exactly TICA's."""
        from deep_cartograph_tpu.cv.htica_stream import StreamingHTICA

        lag = self.configuration.get("lag_time", 1)
        reg = self.configuration.get("tica_regularization", 1e-6)
        sh = StreamingHTICA(
            n_features=self.num_features,
            num_subspaces=1,
            subspaces_dimension=self.cv_dimension,
            cv_dimension=self.cv_dimension,
            lag_time=lag,
            reg=reg,
        )
        try:
            sh.fit(lambda: self._normalized_stream(with_breaks=True))
        except Exception as exc:
            logger.error("TICA could not be computed. Error message: %s", exc)
            return
        self.eigenvalues_ = sh.eigenvalues_
        self.cv = np.asarray(sh.weights, np.float32)

    def compute_cv(self) -> None:
        import jax

        if self._streaming:
            self._compute_cv_streaming()
            return
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
        if not self._streaming:
            self.x_t, self.x_lag = self._lagged_blocks()

    def _compute_cv_streaming(self) -> None:
        from deep_cartograph_tpu.cv.htica_stream import StreamingHTICA

        lag = self.configuration.get("lag_time", 1)
        reg = self.configuration.get("tica_regularization", 1e-6)
        n_sub = self.num_subspaces
        if not isinstance(n_sub, int) or n_sub < 1:
            # same graceful failure as the in-memory branch (where
            # split_subspaces raises and is caught/logged)
            logger.error(
                "num_subspaces must be a positive integer for HTICA; "
                "got %r.", n_sub,
            )
            return
        # StreamingHTICA wants equal contiguous subspaces; pad the feature
        # axis with zeros up to a multiple (zero-variance pad dims carry ~0
        # eigenvalue under regularization and their weight rows are
        # dropped below). Uneven widths therefore differ slightly from the
        # in-memory split_subspaces blocking — streaming targets scales
        # where the in-memory path cannot run at all.
        sub_d = -(-self.num_features // n_sub)
        padded = sub_d * n_sub
        # Multi-chip: shard the SUBSPACE (feature) axis over the mesh when
        # it divides evenly — each device accumulates its own subspaces'
        # moments with zero communication; only the tiny level-2 projected
        # covariance crosses devices (StreamingHTICA's mesh contract).
        import jax

        mesh = None
        n_dev = len(jax.devices())
        if n_dev > 1 and n_sub % n_dev == 0:
            from deep_cartograph_tpu.parallel.mesh import get_mesh

            mesh = get_mesh()
            logger.info(
                "Streaming HTICA sharded over %d devices "
                "(%d subspaces / device).", n_dev, n_sub // n_dev,
            )
        sh = StreamingHTICA(
            n_features=padded,
            num_subspaces=n_sub,
            subspaces_dimension=self.subspaces_dimension,
            cv_dimension=self.cv_dimension,
            lag_time=lag,
            reg=reg,
            mesh=mesh,
        )
        try:
            sh.fit(
                lambda: self._normalized_stream(with_breaks=True,
                                                pad_to=padded)
            )
        except Exception as exc:
            logger.error("TICA could not be computed. Error message: %s", exc)
            return
        self.eigenvalues_ = sh.eigenvalues_
        self.cv = np.asarray(sh.weights[: self.num_features], np.float32)

    def compute_cv(self) -> None:
        if self._streaming:
            self._compute_cv_streaming()
            return
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

