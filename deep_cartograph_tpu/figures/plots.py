"""Plotting layer (matplotlib, host-side).

Parity with the reference figures module
(deep_cartograph/modules/figures/figures.py:24-706): FES plots, CV plots,
cluster scatter plots, size bars, generic data plots, sensitivity bars, and
training-metric curves.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, List, Optional, Sequence

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

logger = logging.getLogger(__name__)


def plot_metrics(
    metrics: Dict[str, List],
    keys: Sequence[str],
    labels: Sequence[str],
    yscale: Optional[str] = "log",
    path: Optional[str] = None,
    ylabel: str = "Loss",
):
    """Training-metric curves vs epoch (replaces mlcolvar.utils.plot.plot_metrics)."""
    fig, ax = plt.subplots(figsize=(6, 4))
    x = metrics.get("epoch", list(range(len(metrics[keys[0]]))))
    for key, label in zip(keys, labels):
        ax.plot(x[: len(metrics[key])], metrics[key], label=label)
    if yscale and yscale != "linear":
        try:
            ax.set_yscale(yscale)
        except ValueError:
            pass
    ax.set_xlabel("Epoch")
    ax.set_ylabel(ylabel)
    ax.legend()
    if path:
        fig.savefig(path, dpi=150, bbox_inches="tight")
        plt.close(fig)
        return None
    return ax


def plot_sensitivity_results(
    results: Dict,
    modes: Sequence[str] = ("barh",),
    output_folder: str = ".",
    max_features: int = 25,
) -> None:
    """Horizontal bar plot of the top feature sensitivities
    (cf. reference figures.py:670-706)."""
    names = results["feature_names"]
    sens = np.asarray(results["sensitivity"]["Dataset"])
    order = np.argsort(sens)[-max_features:]
    fig, ax = plt.subplots(figsize=(7, max(3, 0.3 * len(order))))
    ax.barh([names[i] for i in order], sens[order], color="#4878d0")
    ax.set_xlabel("Sensitivity")
    fig.savefig(
        os.path.join(output_folder, "sensitivity_barh.png"),
        dpi=150,
        bbox_inches="tight",
    )
    plt.close(fig)


def plot_data(
    y_data: Dict[str, np.ndarray],
    x_data: Dict[str, np.ndarray],
    title: str,
    y_label: str,
    x_label: str,
    figure_path: str,
) -> None:
    """Generic multi-series line plot (cf. reference figures.py:595-668)."""
    fig, ax = plt.subplots(figsize=(7, 4))
    for key, y in y_data.items():
        ax.plot(np.asarray(x_data[key]), np.asarray(y), label=key, linewidth=1)
    ax.set_title(title)
    ax.set_xlabel(x_label)
    ax.set_ylabel(y_label)
    if len(y_data) > 1:
        ax.legend(fontsize=7)
    fig.savefig(figure_path, dpi=150, bbox_inches="tight")
    plt.close(fig)


def generate_colors(num_colors: int, cmap_name: str = "turbo") -> List:
    """Evenly spaced colors from a colormap (cf. reference figures.py:543-589)."""
    cmap = plt.get_cmap(cmap_name)
    if num_colors == 1:
        return [cmap(0.5)]
    return [cmap(i / (num_colors - 1)) for i in range(num_colors)]


def plot_clusters_size(
    cluster_labels: np.ndarray, cluster_colors: List, output_folder: str
) -> None:
    """Bar plot of cluster populations (cf. reference figures.py:479-541)."""
    labels, counts = np.unique(cluster_labels, return_counts=True)
    fig, ax = plt.subplots(figsize=(6, 4))
    colors = (
        cluster_colors if len(cluster_colors) >= len(labels) else None
    )
    ax.bar([str(l) for l in labels], counts, color=colors)
    ax.set_xlabel("Cluster")
    ax.set_ylabel("Number of samples")
    fig.savefig(
        os.path.join(output_folder, "clusters_size.png"), dpi=150, bbox_inches="tight"
    )
    plt.close(fig)


def gradient_scatter_plot(
    data,
    column_labels: Sequence[str],
    color_label: str,
    settings: Dict,
    file_path: str,
) -> None:
    """2-D scatter colored by a gradient column (frame number)
    (cf. reference figures.py:343-398)."""
    fig, ax = plt.subplots(figsize=(6, 5))
    sc = ax.scatter(
        data[column_labels[0]],
        data[column_labels[1]],
        c=data[color_label],
        cmap=settings.get("cmap", "turbo"),
        alpha=settings.get("alpha", 0.8),
        s=settings.get("marker_size", 5),
    )
    fig.colorbar(sc, ax=ax, label=color_label)
    ax.set_xlabel(column_labels[0])
    ax.set_ylabel(column_labels[1])
    fig.savefig(file_path, dpi=150, bbox_inches="tight")
    plt.close(fig)


def clusters_scatter_plot(
    data,
    column_labels: Sequence[str],
    cluster_label: str,
    settings: Dict,
    file_path: str,
    cluster_colors: Optional[List] = None,
) -> None:
    """2-D scatter colored by cluster with centroids highlighted
    (cf. reference figures.py:281-342)."""
    fig, ax = plt.subplots(figsize=(6, 5))
    clusters = np.unique(data[cluster_label])
    colors = cluster_colors or generate_colors(
        len(clusters), settings.get("cmap", "turbo")
    )
    for i, cl in enumerate(clusters):
        sub = data[data[cluster_label] == cl]
        ax.scatter(
            sub[column_labels[0]],
            sub[column_labels[1]],
            color=colors[i % len(colors)],
            alpha=settings.get("alpha", 0.8),
            s=settings.get("marker_size", 5),
            label=f"cluster {cl}",
        )
    if "centroid" in getattr(data, "columns", []):
        cents = data[data["centroid"] == True]  # noqa: E712
        if len(cents):
            ax.scatter(
                cents[column_labels[0]],
                cents[column_labels[1]],
                marker="x",
                color="black",
                s=60,
                label="centroids",
            )
    ax.set_xlabel(column_labels[0])
    ax.set_ylabel(column_labels[1])
    ax.legend(fontsize=7, markerscale=2)
    fig.savefig(file_path, dpi=150, bbox_inches="tight")
    plt.close(fig)


def create_cv_plot(
    fes: np.ndarray,
    grid,
    cv_data: np.ndarray,
    cv_labels: Sequence[str],
    settings: Dict,
    file_path: str,
) -> None:
    """FES contour + projected CV samples overlay (cf. figures.py:194-279)."""
    fig, ax = plt.subplots(figsize=(6, 5))
    if fes.ndim == 2:
        cs = ax.contourf(
            grid[0], grid[1], fes.T, levels=settings.get("num_fes_levels", 10),
            cmap="viridis",
        )
        fig.colorbar(cs, ax=ax, label="FES (kJ/mol)")
        ax.scatter(cv_data[:, 0], cv_data[:, 1], s=2, c="white", alpha=0.3)
        ax.set_xlabel(cv_labels[0])
        ax.set_ylabel(cv_labels[1])
    fig.savefig(file_path, dpi=150, bbox_inches="tight")
    plt.close(fig)


def get_ranges(X: np.ndarray, X_ref=None) -> list:
    """Data range per dimension with a small margin
    (cf. reference figures.py:399-477; 0.5% margin in 1D, 5% in ND)."""
    X = np.asarray(X)
    # The reference branches on X.shape[1] (figures.py:416-424), so a
    # column vector (n, 1) also takes the flat-tuple 1-D path.
    if X.ndim == 1 or (X.ndim == 2 and X.shape[1] == 1):
        lo, hi = float(np.min(X)), float(np.max(X))
        if X_ref is not None:
            for ref in X_ref:
                lo = min(lo, float(np.min(ref)))
                hi = max(hi, float(np.max(ref)))
        offset = 0.005 * (hi - lo)
        return (lo - offset, hi + offset)
    ranges = []
    for i in range(X.shape[1]):
        lo, hi = float(np.min(X[:, i])), float(np.max(X[:, i]))
        if X_ref is not None:
            for ref in X_ref:
                lo = min(lo, float(np.min(ref[:, i])))
                hi = max(hi, float(np.max(ref[:, i])))
        offset = 0.05 * (hi - lo)
        ranges.append((lo - offset, hi + offset))
    return ranges


def generate_cmap(num_colors: int, cmap_name: str = "turbo"):
    """ListedColormap of evenly spaced colors (cf. reference figures.py:543-589)."""
    from matplotlib.colors import ListedColormap

    return ListedColormap(generate_colors(num_colors, cmap_name))
