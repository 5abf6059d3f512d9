"""Feature filtering: entropy / std / dip-test / waypoint screens.

Semantics parity with the reference Filter
(deep_cartograph/modules/features/filter.py:19-288) with the key
architectural change for TPU: the colvars files are read ONCE into a single
(frames, features) matrix and every statistic is computed for all features in
one vectorized pass — the reference's per-feature file re-read loop
(filter.py:213-228, documented O(N_feat x file_size) I/O) is gone.
"""

from __future__ import annotations

import logging
import os
import sys
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np
import pandas as pd

from deep_cartograph_tpu.io.colvars import read_column_names, read_features
from deep_cartograph_tpu.features.translator import Translator
from deep_cartograph_tpu.stats.descriptors import (
    difference_filter,
    dip_pvalues,
    min_value_filter,
    shannon_entropy,
    standard_deviation,
)
from deep_cartograph_tpu.utils.common import save_list

logger = logging.getLogger(__name__)


class Filter:
    def __init__(
        self,
        settings: Dict,
        colvars_paths: List[str],
        waypoint_colvars_paths: Optional[List[str]] = None,
        topologies: Optional[List[str]] = None,
        waypoint_topologies: Optional[List[str]] = None,
        reference_topology: Optional[str] = None,
        output_dir: str = "filter_features",
    ) -> None:
        logger.info("Initializing Filter")

        self.colvars_paths = colvars_paths
        self.waypoint_colvars_paths = waypoint_colvars_paths
        self.output_dir = output_dir
        if topologies and reference_topology is None:
            reference_topology = topologies[0]
        self.topology_paths = topologies
        self.waypoint_topologies = waypoint_topologies
        self.ref_topology_path = reference_topology

        if self.topology_paths and len(self.colvars_paths) != len(self.topology_paths):
            logger.error(
                "The number of colvars files must equal the number of topology files."
            )
            sys.exit(1)

        self.common_ref_features = self.find_common_features()
        logger.info(
            "Initial size of features set (only common features): %d.",
            len(self.common_ref_features),
        )
        os.makedirs(self.output_dir, exist_ok=True)
        save_list(
            self.common_ref_features,
            os.path.join(self.output_dir, "all_features.txt"),
        )

        # Thresholds (Angstrom threshold converted to nm; cf. filter.py:92-96)
        dist_threshold_angstrom = settings.get("local_distance_threshold", None)
        self.local_distance_threshold: Optional[float] = (
            dist_threshold_angstrom / 10
            if dist_threshold_angstrom is not None
            else None
        )
        self.diptest_significance_level = settings.get("diptest_significance_level")
        self.entropy_quantile = settings.get("entropy_quantile")
        self.std_quantile = settings.get("std_quantile")

        self.diptest_filter = self.diptest_significance_level is not None
        self.entropy_filter = self.entropy_quantile is not None
        self.std_filter = self.std_quantile is not None
        self.local_contact_filter = self.local_distance_threshold is not None
        self.filter_features = (
            self.diptest_filter
            or self.entropy_filter
            or self.std_filter
            or (self.waypoint_colvars_paths is not None)
        )

        self.features_data = pd.DataFrame(
            {"name": self.common_ref_features, "pass": True}
        )

    def find_common_features(self) -> List[str]:
        """Intersect (translated) colvars headers across files
        (cf. reference filter.py:128-167)."""
        common: Optional[List[str]] = None
        for ci, colvars_path in enumerate(self.colvars_paths):
            names = read_column_names(colvars_path, features_only=True)
            if self.topology_paths:
                translated = Translator(
                    self.topology_paths[ci], self.ref_topology_path, names
                ).run()
                for fi, t in enumerate(translated):
                    if t is None:
                        logger.warning(
                            "Feature %s from %s not found in the reference topology.",
                            names[fi],
                            Path(colvars_path).name,
                        )
                ref_names = [t for t in translated if t is not None]
            else:
                ref_names = names
            if common is not None:
                # an EMPTY intersection must stay empty (truthiness would
                # treat it as "first file" and reset to the next file's list)
                common = [f for f in common if f in ref_names]
            else:
                common = ref_names
        if not common:
            logger.error("No common features found in the colvars files.")
            sys.exit(1)
        return list(common)

    def _read_all(self, colvars_paths, topologies) -> np.ndarray:
        df = read_features(
            colvars_paths,
            ref_feature_names=self.common_ref_features,
            topology_paths=topologies,
            reference_topology=self.ref_topology_path,
        )
        arr = df.to_numpy(dtype=np.float32)
        if np.isnan(arr).any():
            # same screen as create_dataframe_from_files / the streaming
            # path: NaN statistics silently corrupt every threshold
            raise ValueError("Clean your data! NaNs found in the colvars files.")
        return arr

    # -- larger-than-RAM inputs: stream the statistics --------------------
    # The reference reads per-feature columns file-by-file (filter.py:
    # 213-228) and the in-memory path here reads one full matrix; both hit
    # a RAM ceiling. Past DEEP_CARTO_STREAM_BYTES (default 4 GiB), the
    # screens stream instead: std from f64 moments, entropy from exact
    # global-min/max histogram counts (identical binning math to
    # stats.descriptors._bin_indices), and the dip test — which needs full
    # per-feature columns — from bounded feature-block column passes.
    def _should_stream_stats(self) -> bool:
        from deep_cartograph_tpu.io.colvars import (
            should_stream_colvars,
            translation_is_identity,
        )

        # real cross-topology translation (distinct topologies): in-memory
        if not translation_is_identity(
            self.topology_paths, self.ref_topology_path
        ):
            return False
        return should_stream_colvars(self.colvars_paths, "auto")

    def _stream_chunks(self, feature_names: List[str]):
        # chunk rows auto-size from each file's FULL width (the parsed
        # slab holds every column regardless of the selection); NaNs
        # anywhere raise like _read_all's screen
        from deep_cartograph_tpu.io.colvars import iter_features_chunks

        for path in self.colvars_paths:
            yield from iter_features_chunks(
                path, feature_names=feature_names, nan_check=True
            )

    def _compute_stats_streaming(self) -> None:
        names = self.common_ref_features
        F = len(names)
        num_bins = 100
        logger.info(
            "Streaming filter statistics: %d features over %d file(s).",
            F, len(self.colvars_paths),
        )
        # pass 1: f64 moments + per-feature min/max
        n = 0
        s1 = np.zeros(F, np.float64)
        s2 = np.zeros(F, np.float64)
        mn = np.full(F, np.inf, np.float32)
        mx = np.full(F, -np.inf, np.float32)
        for blk in self._stream_chunks(names):
            b64 = blk.astype(np.float64)
            n += blk.shape[0]
            s1 += b64.sum(axis=0)
            s2 += (b64 * b64).sum(axis=0)
            np.minimum(mn, blk.min(axis=0), out=mn)
            np.maximum(mx, blk.max(axis=0), out=mx)
        if n == 0:
            logger.error("The resulting dataframe is empty.")
            sys.exit(1)
        if self.std_filter:
            mean = s1 / n
            var = np.maximum(s2 / n - mean * mean, 0.0)
            self.features_data["std"] = np.round(np.sqrt(var), 3)

        # pass 2: exact histogram entropy (same f32 binning math as
        # descriptors._bin_indices over the global min/max)
        if self.entropy_filter:
            span = np.where(mx > mn, mx - mn, np.float32(1.0)).astype(
                np.float32
            )
            counts = np.zeros(F * num_bins, np.int64)
            col_base = (np.arange(F, dtype=np.int64) * num_bins)[None, :]
            for blk in self._stream_chunks(names):
                idx = np.clip(
                    ((blk - mn) / span * num_bins).astype(np.int32),
                    0, num_bins - 1,
                ).astype(np.int64)
                counts += np.bincount(
                    (idx + col_base).ravel(), minlength=F * num_bins
                )
            p = counts.reshape(F, num_bins) / n
            with np.errstate(divide="ignore", invalid="ignore"):
                plogp = np.where(p > 0, p * np.log2(np.where(p > 0, p, 1.0)),
                                 0.0)
            self.features_data["entropy"] = np.round(-plogp.sum(axis=1), 3)

        # dip test: full per-feature columns required — bounded
        # feature-block column passes (rows x K <= the block budget)
        if self.diptest_filter:
            block_budget = 256 * 2**20
            K = max(int(block_budget // max(4 * n, 1)), 1)
            hdtp = np.empty(F, np.float64)
            n_passes = -(-F // K)
            logger.info(
                "Streaming dip test: %d feature-column passes of <=%d "
                "features (full columns needed per feature).", n_passes, K,
            )
            for s in range(0, F, K):
                sub = names[s : s + K]
                cols = np.concatenate(
                    list(self._stream_chunks(sub)), axis=0
                )
                hdtp[s : s + len(sub)] = dip_pvalues(cols)
            self.features_data["hdtp"] = hdtp

    def run(self, csv_summary: bool = False) -> List[str]:
        """Apply all requested screens and return surviving feature names."""
        names = self.common_ref_features

        if self.filter_features:
            # Waypoint screens (variation across metastable structures)
            if self.waypoint_colvars_paths is not None:
                waypoint_matrix = self._read_all(
                    self.waypoint_colvars_paths, self.waypoint_topologies
                )
                self.features_data["waypoint_difference"] = difference_filter(
                    waypoint_matrix, names
                )
                self.features_data.loc[
                    ~self.features_data["waypoint_difference"], "pass"
                ] = False
                if self.local_contact_filter:
                    self.features_data["is_local_contact"] = min_value_filter(
                        waypoint_matrix, self.local_distance_threshold
                    )
                    self.features_data.loc[
                        ~self.features_data["is_local_contact"], "pass"
                    ] = False

            # One pass over all trajectory data for every statistic
            needs_stats = self.entropy_filter or self.std_filter or self.diptest_filter
            if needs_stats:
                if self._should_stream_stats():
                    self._compute_stats_streaming()
                else:
                    matrix = self._read_all(
                        self.colvars_paths, self.topology_paths
                    )
                    if self.entropy_filter:
                        self.features_data["entropy"] = shannon_entropy(matrix)
                    if self.std_filter:
                        self.features_data["std"] = standard_deviation(matrix)
                    if self.diptest_filter:
                        self.features_data["hdtp"] = dip_pvalues(matrix)

        # Quantile / significance thresholds (cf. reference filter.py:258-272)
        if self.entropy_filter and self.entropy_quantile > 0:
            thr = self.features_data["entropy"].quantile(q=self.entropy_quantile)
            logger.info(
                "    Entropy threshold: %.2f bits (quantile: %.2f)",
                thr,
                self.entropy_quantile,
            )
            self.features_data.loc[self.features_data["entropy"] < thr, "pass"] = False

        if self.std_filter and self.std_quantile > 0:
            thr = self.features_data["std"].quantile(q=self.std_quantile)
            logger.info(
                "    Standard deviation threshold: %.2f a.u. (quantile: %.2f)",
                thr,
                self.std_quantile,
            )
            self.features_data.loc[self.features_data["std"] < thr, "pass"] = False

        if self.diptest_filter and self.diptest_significance_level > 0:
            self.features_data.loc[
                self.features_data["hdtp"] > self.diptest_significance_level, "pass"
            ] = False

        if csv_summary:
            self.features_data.to_csv(
                os.path.join(self.output_dir, "filter_summary.csv"), index=False
            )

        self.features_data = self.features_data[self.features_data["pass"]]
        final = self.features_data["name"].tolist()
        logger.info("Filtered %d features.", len(names) - len(final))
        return final
