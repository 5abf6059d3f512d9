"""Free-energy surfaces: on-device Gaussian-KDE + block-error estimation.

Replaces the reference's mlcolvar.utils.fes.compute_fes / KDEpy backend
(cf. deep_cartograph/modules/figures/figures.py:24-192): the kernel sums are
one jitted logsumexp over (grid_points, samples) on device; block averaging
gives the standard error.
"""

from __future__ import annotations

import logging
import os
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

KB_KJ_MOL = 0.00831446261815324  # kJ/(mol K)


@partial(jax.jit, static_argnames=("num_blocks",))
def _kde_fes_device(samples, grid_points, bandwidth, kt, num_blocks: int):
    """FES on grid points + per-block FES for error bars.

    samples: (n, d) — n must be divisible by num_blocks (caller trims).
    grid_points: (g, d).
    """
    n, d = samples.shape
    inv_bw2 = 1.0 / (2.0 * bandwidth**2)

    # log-kernel matrix in blocks over samples to bound memory
    diff2 = jnp.sum(
        (grid_points[:, None, :] - samples[None, :, :]) ** 2, axis=-1
    )  # (g, n)
    logk = -diff2 * inv_bw2

    # Full-data density (unnormalized is fine: FES is shifted to min 0)
    logp = jax.scipy.special.logsumexp(logk, axis=1) - jnp.log(n)
    fes = -kt * logp
    fes = fes - jnp.min(fes)

    # Block FES estimates
    blocks = logk.reshape(grid_points.shape[0], num_blocks, n // num_blocks)
    logp_b = jax.scipy.special.logsumexp(blocks, axis=2) - jnp.log(
        n // num_blocks
    )
    fes_b = -kt * logp_b
    fes_b = fes_b - jnp.min(fes_b, axis=0, keepdims=True)
    error = jnp.std(fes_b, axis=1) / jnp.sqrt(num_blocks)
    return fes, error


def _blockwise_fes(data, grid_points, kt, num_blocks, block_logsumexp):
    """Shared blockwise-FES harness: per-block raw logsumexp densities
    combine exactly into the full-data estimate (logsumexp over all
    samples = logsumexp_b(block_logsumexp_b)); block FES estimates give
    the standard block error. `block_logsumexp(chunk) -> (grid,)` raw
    logsumexp over the chunk's samples."""
    n = data.shape[0]
    block_len = n // num_blocks
    block_lse = np.stack([
        block_logsumexp(data[b * block_len : (b + 1) * block_len])
        for b in range(num_blocks)
    ])  # (num_blocks, grid)
    from scipy.special import logsumexp as _lse

    full_logp = _lse(block_lse, axis=0) - np.log(n)
    fes = -kt * full_logp
    fes = fes - fes.min()
    if num_blocks > 1:
        fes_b = -kt * (block_lse - np.log(block_len))
        fes_b = fes_b - fes_b.min(axis=1, keepdims=True)
        error = fes_b.std(axis=0) / np.sqrt(num_blocks)
    else:
        error = None
    return fes, error


def _kde_fes_streaming(
    data: np.ndarray,
    grid_points: np.ndarray,
    bandwidth: float,
    kt: float,
    num_blocks: int,
):
    """Blockwise FES via the streaming Pallas logsumexp kernel."""
    from deep_cartograph_tpu.ops.pallas_kernels import kde_logsumexp

    inv_two_bw2 = 1.0 / (2.0 * bandwidth * bandwidth)
    grid_d = jnp.asarray(grid_points)
    return _blockwise_fes(
        data, grid_points, kt, num_blocks,
        lambda chunk: np.asarray(
            kde_logsumexp(grid_d, jnp.asarray(chunk), inv_two_bw2)
        ),
    )


def _kde_fes_sharded(
    data: np.ndarray,
    grid_points: np.ndarray,
    bandwidth: float,
    kt: float,
    num_blocks: int,
):
    """Blockwise FES with each block's samples FRAME-SHARDED over all
    devices (parallel.sharding.sharded_kde_logdensity: local logsumexp +
    pmax/psum combine) — the pod-scale FES path, engaged automatically on
    multi-device backends."""
    from deep_cartograph_tpu.parallel.sharding import sharded_kde_logdensity

    block_len = data.shape[0] // num_blocks
    return _blockwise_fes(
        data, grid_points, kt, num_blocks,
        # sharded_kde_logdensity returns a normalized log density; undo
        # the 1/len normalization to get the raw block logsumexp.
        lambda chunk: sharded_kde_logdensity(chunk, grid_points, bandwidth)
        + np.log(block_len),
    )


def compute_fes(
    data: np.ndarray,
    temperature: float = 300.0,
    bandwidth: float = 0.05,
    num_bins: int = 100,
    num_blocks: int = 1,
    bounds: Optional[Sequence[Tuple[float, float]]] = None,
) -> Tuple[List[np.ndarray], np.ndarray, Optional[np.ndarray]]:
    """KDE free-energy surface (kJ/mol, min set to zero).

    Returns (grid_axes, fes, error). 1-D: fes shape (num_bins,);
    2-D: (num_bins, num_bins) with fes[i, j] at (x=grid[0][i], y=grid[1][j]).
    """
    data = np.asarray(data, np.float32)
    if data.ndim == 1:
        data = data[:, None]
    n, d = data.shape
    if d > 2:
        raise ValueError("FES supports 1 or 2 dimensions")
    kt = KB_KJ_MOL * temperature

    if bounds is None:
        bounds = [(data[:, i].min(), data[:, i].max()) for i in range(d)]
    axes = [
        np.linspace(lo, hi, num_bins).astype(np.float32) for lo, hi in bounds
    ]
    if d == 1:
        grid_points = axes[0][:, None]
    else:
        gx, gy = np.meshgrid(axes[0], axes[1], indexing="ij")
        grid_points = np.stack([gx.reshape(-1), gy.reshape(-1)], axis=1)

    num_blocks = max(1, min(num_blocks, n))
    n_trim = (n // num_blocks) * num_blocks

    if grid_points.shape[0] * n_trim > 50_000_000:
        import jax as _jax

        if len(_jax.devices()) > 1:
            # Multi-device backend: frame-shard each block's samples over
            # the mesh (pmax/psum logsumexp combine).
            fes, error = _kde_fes_sharded(
                data[:n_trim], grid_points, bandwidth, kt, num_blocks
            )
        else:
            # Single device: the streaming Pallas kernel never materializes
            # the (grid, samples) matrix (ops/pallas_kernels.kde_logsumexp).
            fes, error = _kde_fes_streaming(
                data[:n_trim], grid_points, bandwidth, kt, num_blocks
            )
    else:
        from deep_cartograph_tpu.utils.device import maybe_cpu

        with maybe_cpu(float(grid_points.shape[0]) * n_trim):
            fes, error = _kde_fes_device(
                jnp.asarray(data[:n_trim]),
                jnp.asarray(grid_points),
                jnp.float32(bandwidth),
                jnp.float32(kt),
                num_blocks,
            )
            fes = np.asarray(fes)
            error = np.asarray(error) if num_blocks > 1 else None
    if d == 2:
        fes = fes.reshape(num_bins, num_bins)
        if error is not None:
            error = error.reshape(num_bins, num_bins)
    return axes, fes, error


def plot_fes(
    data: np.ndarray,
    cv_labels: Sequence[str],
    settings: Dict,
    output_path: str,
    num_blocks: int = 1,
    sup_data: Optional[List[np.ndarray]] = None,
    sup_data_labels: Optional[Sequence[str]] = None,
) -> None:
    """Compute + plot (and optionally save) the FES
    (cf. reference figures.py:24-192)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if not settings.get("compute", True):
        return
    data = np.asarray(data)
    if data.ndim == 1:
        data = data[:, None]
    d = data.shape[1]
    axes_grid, fes, error = compute_fes(
        data,
        temperature=settings.get("temperature", 300),
        bandwidth=settings.get("bandwidth", 0.05),
        num_bins=settings.get("num_bins", 100),
        num_blocks=num_blocks,
    )
    max_fes = settings.get("max_fes")

    os.makedirs(output_path, exist_ok=True)
    fig, ax = plt.subplots(figsize=(6, 5))
    if d == 1:
        masked = np.where(
            (fes > max_fes) if max_fes is not None
            else np.zeros_like(fes, bool),
            np.nan,
            fes,
        )
        ax.plot(axes_grid[0], masked, color="#4878d0")
        if error is not None:
            ax.fill_between(
                axes_grid[0],
                masked - 2 * error,
                masked + 2 * error,
                alpha=0.3,
                color="#4878d0",
            )
        if sup_data is not None:
            for si, sup in enumerate(sup_data):
                label = (
                    sup_data_labels[si]
                    if sup_data_labels and si < len(sup_data_labels)
                    else f"sup_{si}"
                )
                heights = np.interp(np.asarray(sup).ravel(), axes_grid[0], masked)
                ax.scatter(np.asarray(sup).ravel(), heights, s=12, label=label)
            ax.legend(fontsize=7)
        ax.set_xlabel(cv_labels[0])
        ax.set_ylabel("FES (kJ/mol)")
    else:
        masked = np.where(
            (fes > max_fes) if max_fes is not None
            else np.zeros_like(fes, bool),
            np.nan,
            fes,
        )
        cs = ax.contourf(
            axes_grid[0],
            axes_grid[1],
            masked.T,
            levels=settings.get("num_fes_levels", 10),
            cmap="fessa" if "fessa" in plt.colormaps() else "viridis",
        )
        fig.colorbar(cs, ax=ax, label="FES (kJ/mol)")
        if sup_data is not None:
            for si, sup in enumerate(sup_data):
                label = (
                    sup_data_labels[si]
                    if sup_data_labels and si < len(sup_data_labels)
                    else f"sup_{si}"
                )
                ax.scatter(sup[:, 0], sup[:, 1], s=12, label=label)
            ax.legend(fontsize=7)
        ax.set_xlabel(cv_labels[0])
        ax.set_ylabel(cv_labels[1])

    name = "_".join(str(lbl).replace(" ", "_") for lbl in cv_labels)
    fig.savefig(
        os.path.join(output_path, f"fes_{name}.png"), dpi=150, bbox_inches="tight"
    )
    plt.close(fig)

    if settings.get("save", False):
        np.save(os.path.join(output_path, f"fes_{name}.npy"), fes)
        for i, axis in enumerate(axes_grid):
            np.save(os.path.join(output_path, f"grid_{name}_{i}.npy"), axis)
        if error is not None:
            np.save(os.path.join(output_path, f"fes_error_{name}.npy"), error)
