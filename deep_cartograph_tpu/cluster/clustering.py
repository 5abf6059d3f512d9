"""Clustering: device KMeans + validity scores, host HDBSCAN/hierarchical.

Parity with the reference statistics module
(deep_cartograph/modules/statistics/statistics.py:17-379): same
optimize_clustering recipe (scan N over search_interval, combined max-min
normalized Calinski-Harabasz - Davies-Bouldin + silhouette score), same
dispatch and centroid marking. KMeans runs on device with all n_init
restarts batched via vmap; the three validity scores are computed on device
from a single pairwise-distance program. HDBSCAN and agglomerative stay
host-side (graph algorithms, not TPU-shaped — documented seam, SURVEY §2.4).
"""

from __future__ import annotations

import logging
import os
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# Device KMeans (Lloyd iterations under lax.while_loop, vmapped restarts)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("k", "n_init", "max_iter"))
def _kmeans_device(data, key, k: int, n_init: int, max_iter: int = 300):
    n, d = data.shape

    def init_pp(key):
        """k-means++ seeding."""
        key, sub = jax.random.split(key)
        first = jax.random.randint(sub, (), 0, n)
        centers0 = jnp.zeros((k, d), data.dtype).at[0].set(data[first])

        def body(i, carry):
            centers, key = carry
            d2 = jnp.min(
                jnp.sum((data[:, None, :] - centers[None, :, :]) ** 2, -1)
                + jnp.where(jnp.arange(k)[None, :] < i, 0.0, jnp.inf),
                axis=1,
            )
            key, sub = jax.random.split(key)
            probs = d2 / jnp.maximum(jnp.sum(d2), 1e-12)
            nxt = jax.random.choice(sub, n, p=probs)
            return centers.at[i].set(data[nxt]), key

        centers, _ = jax.lax.fori_loop(1, k, body, (centers0, key))
        return centers

    def lloyd(centers):
        def cond(state):
            _, shift, it = state
            return jnp.logical_and(shift > 1e-6, it < max_iter)

        def step(state):
            centers, _, it = state
            d2 = jnp.sum((data[:, None, :] - centers[None, :, :]) ** 2, -1)
            assign = jnp.argmin(d2, axis=1)
            one_hot = jax.nn.one_hot(assign, k, dtype=data.dtype)
            counts = jnp.sum(one_hot, axis=0)
            sums = one_hot.T @ data
            new_centers = jnp.where(
                counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1), centers
            )
            shift = jnp.max(jnp.sum((new_centers - centers) ** 2, -1))
            return new_centers, shift, it + 1

        centers, _, _ = jax.lax.while_loop(cond, step, (centers, jnp.inf, 0))
        d2 = jnp.sum((data[:, None, :] - centers[None, :, :]) ** 2, -1)
        assign = jnp.argmin(d2, axis=1)
        inertia = jnp.sum(jnp.min(d2, axis=1))
        return centers, assign, inertia

    keys = jax.random.split(key, n_init)
    centers_all = jax.vmap(init_pp)(keys)
    centers_all, assigns_all, inertias = jax.vmap(lloyd)(centers_all)
    best = jnp.argmin(inertias)
    return centers_all[best], assigns_all[best]


@jax.jit
def _kmeans_warmstart(data, centers, max_iter: int = 300):
    """Lloyd iterations from provided centroids under lax.while_loop (same
    convergence criterion as _kmeans_device's cold-start path)."""
    k = centers.shape[0]

    def cond(state):
        _, shift, it = state
        return jnp.logical_and(shift > 1e-6, it < max_iter)

    def step(state):
        centers, _, it = state
        d2 = jnp.sum((data[:, None, :] - centers[None, :, :]) ** 2, -1)
        assign = jnp.argmin(d2, axis=1)
        one_hot = jax.nn.one_hot(assign, k, dtype=data.dtype)
        counts = jnp.sum(one_hot, axis=0)
        new_centers = jnp.where(
            counts[:, None] > 0,
            one_hot.T @ data / jnp.maximum(counts[:, None], 1),
            centers,
        )
        shift = jnp.max(jnp.sum((new_centers - centers) ** 2, -1))
        return new_centers, shift, it + 1

    centers, _, _ = jax.lax.while_loop(cond, step, (centers, jnp.inf, 0))
    d2 = jnp.sum((data[:, None, :] - centers[None, :, :]) ** 2, -1)
    return centers, jnp.argmin(d2, axis=1)


def kmeans_clustering(
    feature_matrix: np.ndarray,
    num_clusters: int,
    n_init: int,
    initial_centroids: Optional[np.ndarray] = None,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Device KMeans (cf. reference statistics.py:159-197)."""
    data = jnp.asarray(feature_matrix, jnp.float32)
    if initial_centroids is not None:
        # Single Lloyd run from the provided centroids: lax.while_loop with
        # the same convergence criterion as the cold-start path (a bounded
        # program, not 300 unrolled iterations).
        centers = jnp.asarray(initial_centroids, jnp.float32)
        centers, assign = _kmeans_warmstart(data, centers)
        return np.asarray(assign), np.asarray(centers)

    centers, assign = _kmeans_device(
        data, jax.random.PRNGKey(seed), int(num_clusters), int(n_init)
    )
    return np.asarray(assign), np.asarray(centers)


# ---------------------------------------------------------------------------
# Validity scores on device
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("k", "block"))
def _scores_device(data, labels, k: int, block: int):
    """(calinski_harabasz, davies_bouldin, silhouette) in one pass.

    The silhouette's pairwise distances are computed in ROW BLOCKS of
    `block` samples (a lax.scan over (block, n) distance tiles reduced
    straight into (block, k) per-cluster sums) — peak memory is
    O(block * n), never the (n, n) matrix, so scoring survives
    BASELINE-scale sample counts (100k samples: 40 GB -> ~256 MB tiles).
    """
    n, d = data.shape
    one_hot = jax.nn.one_hot(labels, k, dtype=data.dtype)  # (n, k)
    counts = jnp.sum(one_hot, axis=0)                      # (k,)
    safe_counts = jnp.maximum(counts, 1.0)
    centers = one_hot.T @ data / safe_counts[:, None]
    overall = jnp.mean(data, axis=0)

    # Calinski-Harabasz
    between = jnp.sum(counts * jnp.sum((centers - overall) ** 2, -1))
    diff_to_center = data - centers[labels]
    within = jnp.sum(diff_to_center**2)
    ch = (between / jnp.maximum(k - 1, 1)) / jnp.maximum(
        within / jnp.maximum(n - k, 1), 1e-12
    )

    # Davies-Bouldin: s_i = mean Euclidean distance to the centroid
    dist_to_center = jnp.sqrt(jnp.maximum(jnp.sum(diff_to_center**2, -1), 0.0))
    s = (one_hot.T @ dist_to_center) / safe_counts
    center_d = jnp.sqrt(
        jnp.maximum(
            jnp.sum((centers[:, None, :] - centers[None, :, :]) ** 2, -1), 1e-18
        )
    )
    ratio = (s[:, None] + s[None, :]) / center_d
    ratio = jnp.where(jnp.eye(k, dtype=bool), -jnp.inf, ratio)
    db = jnp.mean(jnp.max(ratio, axis=1))

    # Silhouette: per-cluster distance sums accumulated block-by-block
    n_blocks = (n + block - 1) // block
    pad = n_blocks * block - n
    data_p = jnp.pad(data, ((0, pad), (0, 0)))
    sq = jnp.sum(data**2, axis=1)          # (n,)
    sq_p = jnp.pad(sq, (0, pad))
    row_blocks = data_p.reshape(n_blocks, block, d)
    sq_blocks = sq_p.reshape(n_blocks, block)

    def body(_, blk):
        rows, row_sq = blk
        d2 = row_sq[:, None] - 2.0 * rows @ data.T + sq[None, :]
        dist = jnp.sqrt(jnp.maximum(d2, 0.0))      # (block, n)
        return None, dist @ one_hot                # (block, k)

    _, sums = jax.lax.scan(body, None, (row_blocks, sq_blocks))
    sums_to_clusters = sums.reshape(n_blocks * block, k)[:n]
    own = labels
    a = sums_to_clusters[jnp.arange(n), own] / jnp.maximum(counts[own] - 1, 1)
    mean_other = sums_to_clusters / safe_counts[None, :]
    mean_other = jnp.where(
        jax.nn.one_hot(own, k, dtype=bool), jnp.inf, mean_other
    )
    b = jnp.min(mean_other, axis=1)
    sil = jnp.where(
        counts[own] > 1, (b - a) / jnp.maximum(jnp.maximum(a, b), 1e-12), 0.0
    )
    return ch, db, jnp.mean(sil)


def clustering_scores(
    data: np.ndarray, labels: np.ndarray
) -> Tuple[float, float, float]:
    labels = np.asarray(labels)
    # HDBSCAN noise points carry label -1; a raw gather would wrap them to
    # the LAST cluster, silently skewing all three scores. sklearn treats
    # -1 as its own label — do the same.
    if labels.min() < 0:
        if labels.max() < 0:
            # All noise: remapping would yield a single "cluster" and the
            # score kernels divide by (k-1) — return sentinels instead.
            logger.warning(
                "clustering_scores: every point is noise (all labels -1); "
                "returning NaN scores"
            )
            return float("nan"), float("nan"), float("nan")
        labels = np.where(labels < 0, labels.max() + 1, labels)
    k = int(labels.max()) + 1
    n = int(np.asarray(data).shape[0])
    # ~64M f32 (256 MB) per distance tile; whole matrix for small n
    block = int(min(n, max(128, (1 << 26) // max(n, 1))))
    ch, db, sil = _scores_device(
        jnp.asarray(data, jnp.float32), jnp.asarray(labels), k, block
    )
    return float(ch), float(db), float(sil)


# ---------------------------------------------------------------------------
# Host-side algorithms (documented seam)
# ---------------------------------------------------------------------------

def hdbscan_clustering(
    feature_matrix: np.ndarray,
    min_cluster_size: int = 5,
    max_cluster_size: Optional[int] = None,
    min_samples: Optional[int] = None,
    cluster_selection_epsilon: float = 0.0,
    cluster_selection_method: str = "eom",
    n_jobs: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """HDBSCAN via sklearn (cf. reference statistics.py:199-283). Graph-based
    — intentionally host-side.

    n_jobs=None sizes joblib parallelism from the SLURM allocation
    (SLURM_CPUS_PER_TASK * SLURM_NTASKS, reference statistics.py:229-247);
    pass an explicit value to override.
    """
    from sklearn.cluster import HDBSCAN

    if n_jobs is None:
        n_cores = int(os.environ.get("SLURM_CPUS_PER_TASK", 1))
        n_tasks = int(os.environ.get("SLURM_NTASKS", 1))
        n_jobs = n_cores * n_tasks
    hdb = HDBSCAN(
        min_cluster_size=min_cluster_size,
        min_samples=min_samples,
        n_jobs=None if n_jobs == 1 else n_jobs,
        store_centers="centroid",
        cluster_selection_epsilon=cluster_selection_epsilon,
        max_cluster_size=max_cluster_size,
        cluster_selection_method=cluster_selection_method,
        allow_single_cluster=False,
    )
    hdb.fit(feature_matrix)
    return hdb.labels_, hdb.centroids_


def hierarchical_clustering(
    feature_matrix: np.ndarray,
    cutoff: Optional[float],
    num_clusters: Optional[int] = None,
    linkage: str = "complete",
) -> Tuple[np.ndarray, np.ndarray]:
    """Agglomerative clustering via sklearn; centroids = cluster feature means
    (cf. reference statistics.py:285-335)."""
    from sklearn.cluster import AgglomerativeClustering

    if cutoff is None and num_clusters is None:
        raise ValueError("Either cutoff or num_clusters must be provided")
    if cutoff is not None and num_clusters is not None:
        raise ValueError("Only one of cutoff or num_clusters must be provided")
    hc = AgglomerativeClustering(
        n_clusters=num_clusters, distance_threshold=cutoff, linkage=linkage
    )
    labels = hc.fit_predict(feature_matrix)
    uniq = np.unique(labels)
    centroids = np.stack(
        [feature_matrix[labels == u].mean(axis=0) for u in uniq]
    )
    return labels, centroids


# ---------------------------------------------------------------------------
# Dispatch + optimization (cf. reference statistics.py:17-157)
# ---------------------------------------------------------------------------

def cluster_data(
    features: np.ndarray,
    settings: Dict,
    initial_centroids: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    settings = dict(settings)
    settings.setdefault("algorithm", "kmeans")
    settings.setdefault("num_clusters", 10)
    settings.setdefault("n_init", 10)
    settings.setdefault("min_cluster_size", int(0.1 * features.shape[0]))
    settings.setdefault("min_samples", max(int(0.001 * features.shape[0]), 1))
    settings.setdefault("cluster_selection_epsilon", 0)
    settings.setdefault("linkage", "complete")
    settings.setdefault("max_cluster_size", None)
    settings.setdefault("cluster_selection_method", "eom")

    algo = settings["algorithm"]
    if algo == "kmeans":
        from deep_cartograph_tpu.utils.device import maybe_cpu

        # n_init restarts x Lloyd iterations over the same small matrix
        with maybe_cpu(np.asarray(features).size * 100):
            return kmeans_clustering(
                features, settings["num_clusters"], settings["n_init"],
                initial_centroids,
            )
    if algo == "hdbscan":
        return hdbscan_clustering(
            features,
            settings["min_cluster_size"],
            settings["max_cluster_size"],
            settings["min_samples"],
            settings["cluster_selection_epsilon"],
            settings["cluster_selection_method"],
        )
    if algo == "hierarchical":
        return hierarchical_clustering(
            features, None, settings["num_clusters"], settings["linkage"]
        )
    raise ValueError(f"clustering algorithm {algo} not implemented")


def optimize_clustering(
    features: np.ndarray, settings: Dict
) -> Tuple[np.ndarray, np.ndarray]:
    """Scan num_clusters and keep the best combined score
    (CH normalized - DB normalized + silhouette normalized, equal weights;
    cf. reference statistics.py:54-110)."""
    if settings["algorithm"] in ("kmeans", "hierarchical") and settings.get(
        "opt_num_clusters", True
    ):
        interval = settings.get("search_interval", [2, 15])
        candidates = range(interval[0], interval[1] + 1)
        ch_scores, db_scores, sil_scores, results = [], [], [], []
        for n in candidates:
            run_settings = dict(settings)
            run_settings["num_clusters"] = n
            labels, centroids = cluster_data(features, run_settings)
            ch, db, sil = clustering_scores(features, labels)
            ch_scores.append(ch)
            db_scores.append(db)
            sil_scores.append(sil)
            results.append((labels, centroids))

        def norm(v):
            v = np.asarray(v, float)
            span = v.max() - v.min()
            return (v - v.min()) / span if span > 0 else np.zeros_like(v)

        combined = (norm(ch_scores) - norm(db_scores) + norm(sil_scores)) / 3
        best = int(np.argmax(combined))
        logger.info("Best number of clusters: %d", list(candidates)[best])
        labels, centroids = results[best]
    elif settings["algorithm"] == "hdbscan":
        labels, centroids = cluster_data(features, settings)
    else:
        labels, centroids = cluster_data(features, settings)

    if len(centroids) == 0:
        logger.warning(
            "No clusters found using the provided settings. Try different "
            "settings or a different algorithm"
        )
    return labels, centroids


def find_centroids(
    data: pd.DataFrame, centroids: np.ndarray, clustering_features: list
) -> pd.DataFrame:
    """Mark the sample closest to each centroid (cf. statistics.py:337-379).
    The all-centroid argmin runs as one device distance program."""
    if len(centroids) == 0:
        logger.warning("No centroids found")
        return pd.DataFrame()
    if len(centroids[0]) != len(clustering_features):
        raise ValueError(
            "The dimension of the centroids does not match the clustering "
            "features dimension."
        )
    from deep_cartograph_tpu.utils.device import maybe_cpu

    sample_mat = data.loc[:, clustering_features].to_numpy()
    with maybe_cpu(sample_mat.size * max(len(centroids), 1)):
        samples = jnp.asarray(sample_mat, jnp.float32)
        cents = jnp.asarray(centroids, jnp.float32)
        d2 = (
            jnp.sum(samples**2, 1)[:, None]
            - 2 * samples @ cents.T
            + jnp.sum(cents**2, 1)[None, :]
        )
        closest = np.asarray(jnp.argmin(d2, axis=0))
    data["centroid"] = False
    data.loc[data.index[closest], "centroid"] = True
    return data


def assign_nearest_neighbor(
    new_points: np.ndarray, reference_points: np.ndarray
) -> np.ndarray:
    """Index of the nearest reference sample for each new point — brute-force
    1-NN as a device matmul (replaces sklearn NearestNeighbors in the
    reference traj_cluster workflow, traj_cluster_workflow.py:227-238)."""
    from deep_cartograph_tpu.utils.device import maybe_cpu

    with maybe_cpu(float(np.asarray(new_points).shape[0])
                   * np.asarray(reference_points).size):
        a = jnp.asarray(new_points, jnp.float32)
        b = jnp.asarray(reference_points, jnp.float32)
        d2 = (
            jnp.sum(a**2, 1)[:, None] - 2 * a @ b.T + jnp.sum(b**2, 1)[None, :]
        )
        return np.asarray(jnp.argmin(d2, axis=1))
