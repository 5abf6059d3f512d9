"""Clustering (device kmeans + scores) and KDE FES tests."""

import numpy as np
import pandas as pd
import pytest

from deep_cartograph_tpu.cluster import (
    assign_nearest_neighbor,
    clustering_scores,
    find_centroids,
    kmeans_clustering,
    optimize_clustering,
)
from deep_cartograph_tpu.fes import compute_fes


@pytest.fixture(scope="module")
def blobs():
    rng = np.random.default_rng(5)
    centers = np.array([[0, 0], [5, 5], [0, 6]], float)
    data = np.concatenate(
        [c + 0.4 * rng.standard_normal((120, 2)) for c in centers]
    ).astype(np.float32)
    labels = np.repeat(np.arange(3), 120)
    return data, labels


def test_kmeans_recovers_blobs(blobs):
    data, true_labels = blobs
    labels, centroids = kmeans_clustering(data, 3, n_init=5)
    assert centroids.shape == (3, 2)
    # Perfect recovery up to label permutation
    from scipy.stats import mode

    remap = {}
    for c in range(3):
        remap[c] = mode(true_labels[labels == c]).mode
    mapped = np.array([remap[l] for l in labels])
    assert (mapped == true_labels).mean() > 0.99


def test_scores_match_sklearn(blobs):
    data, _ = blobs
    labels, _ = kmeans_clustering(data, 3, n_init=5)
    ch, db, sil = clustering_scores(data, labels)
    from sklearn.metrics import (
        calinski_harabasz_score,
        davies_bouldin_score,
        silhouette_score,
    )

    assert abs(ch - calinski_harabasz_score(data, labels)) / ch < 1e-3
    assert abs(db - davies_bouldin_score(data, labels)) < 1e-3
    assert abs(sil - silhouette_score(data, labels)) < 1e-3


def test_blocked_silhouette_matches_dense(blobs):
    """Row-blocked silhouette (bounded memory at 100k-sample scale) must
    match sklearn even when the block size forces many tiles + padding."""
    import jax.numpy as jnp

    from deep_cartograph_tpu.cluster.clustering import _scores_device

    data, labels = blobs
    from sklearn.metrics import silhouette_score

    expected = silhouette_score(data, labels)
    for block in (7, 64, 360):  # ragged tail, mid, single tile
        _, _, sil = _scores_device(
            jnp.asarray(data), jnp.asarray(labels), 3, block
        )
        assert abs(float(sil) - expected) < 1e-3, block


def test_kmeans_warmstart_converges(blobs):
    """initial_centroids path: bounded while_loop program, converges to the
    same solution as cold start (round-1 bug: 300 unrolled jit iterations)."""
    data, true_labels = blobs
    # perturbed true centers: Lloyd must walk them back
    init = np.array([[1.0, 1.0], [4.0, 6.0], [-1.0, 5.0]], np.float32)
    labels, centroids = kmeans_clustering(
        data, 3, n_init=1, initial_centroids=init
    )
    assert centroids.shape == (3, 2)
    from scipy.stats import mode

    mapped = np.array(
        [mode(true_labels[labels == c]).mode for c in range(3)]
    )
    assert len(set(mapped.tolist())) == 3  # three distinct blobs found
    # converged: one extra Lloyd step does not move the centroids
    labels2, centroids2 = kmeans_clustering(
        data, 3, n_init=1, initial_centroids=centroids
    )
    np.testing.assert_allclose(centroids2, centroids, atol=1e-4)
    assert (labels2 == labels).all()


def test_optimize_clustering_finds_three(blobs):
    data, _ = blobs
    settings = {
        "algorithm": "kmeans",
        "opt_num_clusters": True,
        "search_interval": [2, 6],
        "n_init": 5,
    }
    labels, centroids = optimize_clustering(data, settings)
    assert len(np.unique(labels)) == 3


def test_hierarchical_and_hdbscan(blobs):
    data, _ = blobs
    labels, centroids = optimize_clustering(
        data,
        {
            "algorithm": "hierarchical",
            "opt_num_clusters": True,
            "search_interval": [2, 5],
            "linkage": "complete",
        },
    )
    assert len(np.unique(labels)) == 3
    labels, centroids = optimize_clustering(
        data,
        {"algorithm": "hdbscan", "min_cluster_size": 30, "min_samples": 5,
         "cluster_selection_epsilon": 0.0, "cluster_selection_method": "eom",
         "max_cluster_size": None},
    )
    assert len(np.unique(labels[labels >= 0])) == 3


def test_find_centroids_and_nn(blobs):
    data, _ = blobs
    labels, centroids = kmeans_clustering(data, 3, n_init=5)
    df = pd.DataFrame(data, columns=["x", "y"])
    df = find_centroids(df, centroids, ["x", "y"])
    assert df["centroid"].sum() == 3
    # 1-NN assignment: points near first centroid map to its cluster
    new = centroids + 0.01
    idx = assign_nearest_neighbor(new, data)
    assigned = labels[idx]
    for i, c in enumerate(centroids):
        d = np.linalg.norm(data[labels == assigned[i]].mean(0) - c)
        assert d < 0.5


def test_fes_1d_two_wells():
    rng = np.random.default_rng(0)
    data = np.concatenate(
        [rng.standard_normal(4000) * 0.1 - 0.5, rng.standard_normal(4000) * 0.1 + 0.5]
    )
    axes, fes, err = compute_fes(
        data, temperature=300, bandwidth=0.05, num_bins=101, num_blocks=4
    )
    assert fes.shape == (101,)
    assert abs(fes.min()) < 1e-5
    # barrier at x=0 far higher than the wells
    center = fes[np.argmin(np.abs(axes[0]))]
    well_left = fes[np.argmin(np.abs(axes[0] + 0.5))]
    assert center > well_left + 10.0  # kJ/mol
    assert err is not None and np.isfinite(err).all()


def test_fes_2d_shape_and_min():
    rng = np.random.default_rng(1)
    data = rng.standard_normal((2000, 2)).astype(np.float32) * 0.3
    axes, fes, _ = compute_fes(data, num_bins=40, bandwidth=0.1)
    assert fes.shape == (40, 40)
    # minimum near the center of the grid
    imin = np.unravel_index(np.argmin(fes), fes.shape)
    assert 10 < imin[0] < 30 and 10 < imin[1] < 30


def test_clustering_scores_treats_noise_as_own_label(rng):
    """HDBSCAN-style -1 noise labels form their own cluster in the validity
    scores (sklearn semantics) instead of wrapping onto the last cluster."""
    import numpy as np

    from deep_cartograph_tpu.cluster.clustering import clustering_scores

    pts = np.concatenate([
        rng.normal(0, 0.1, (40, 2)),
        rng.normal(5, 0.1, (40, 2)),
        rng.normal([2.5, 10.0], 0.1, (5, 2)),  # "noise" far away
    ]).astype(np.float32)
    labels_noise = np.array([0] * 40 + [1] * 40 + [-1] * 5)
    labels_remap = np.array([0] * 40 + [1] * 40 + [2] * 5)
    np.testing.assert_allclose(
        clustering_scores(pts, labels_noise),
        clustering_scores(pts, labels_remap),
        rtol=1e-6,
    )


def test_clustering_scores_all_noise_returns_nan(rng):
    """When HDBSCAN marks every point as noise, the scores are NaN sentinels
    rather than undefined single-cluster values."""
    import numpy as np

    from deep_cartograph_tpu.cluster.clustering import clustering_scores

    pts = rng.normal(0, 1.0, (30, 2)).astype(np.float32)
    ch, db, sil = clustering_scores(pts, np.full(30, -1))
    assert np.isnan(ch) and np.isnan(db) and np.isnan(sil)


def test_hdbscan_n_jobs_from_slurm_env(blobs, monkeypatch):
    """hdbscan_clustering sizes joblib parallelism from the SLURM allocation
    (reference statistics.py:229-247) unless an explicit n_jobs is given."""
    import sklearn.cluster

    from deep_cartograph_tpu.cluster import clustering as cl

    data, _ = blobs
    seen = {}
    real = sklearn.cluster.HDBSCAN

    def spy(**kw):
        seen["n_jobs"] = kw.get("n_jobs")
        return real(**kw)

    monkeypatch.setattr(sklearn.cluster, "HDBSCAN", spy)
    monkeypatch.setenv("SLURM_CPUS_PER_TASK", "4")
    monkeypatch.setenv("SLURM_NTASKS", "2")
    cl.hdbscan_clustering(data, min_cluster_size=30)
    assert seen["n_jobs"] == 8
    monkeypatch.setenv("SLURM_CPUS_PER_TASK", "1")
    monkeypatch.setenv("SLURM_NTASKS", "1")
    cl.hdbscan_clustering(data, min_cluster_size=30)
    assert seen["n_jobs"] is None  # n_jobs=1 passes None, like the reference
    cl.hdbscan_clustering(data, min_cluster_size=30, n_jobs=3)
    assert seen["n_jobs"] == 3
