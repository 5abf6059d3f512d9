"""TICA linear algebra on device: time-lagged covariances + generalized eigh.

Replaces mlcolvar's TICA core (cf. reference cv_calculator.py:2249-2267 and
SURVEY §2.4 "Batched XLA linear algebra"): covariance accumulation is a
fp32 matmul (MXU) and the symmetric generalized eigenproblem is solved via
Cholesky whitening. Eigenvectors are normalized in the C0 metric
(v^T C0 v = 1, unit-variance projections) with a deterministic sign
convention (largest-magnitude component positive).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def create_timelagged_dataset(
    data: np.ndarray, lag_time: int = 1
) -> Tuple[np.ndarray, np.ndarray]:
    """Pairs (x_t, x_{t+lag}) from a contiguous trajectory.

    Returns N-lag pairs. (mlcolvar's create_timelagged_dataset trims two
    extra boundary samples, cf. reference cv_calculator.py:2246 — a
    negligible covariance difference documented here for parity tracking.)
    """
    data = np.asarray(data)
    if lag_time <= 0:
        raise ValueError("lag_time must be a positive integer")
    if data.shape[0] <= lag_time:
        raise ValueError(
            f"Need more than lag_time={lag_time} samples, got {data.shape[0]}"
        )
    return data[:-lag_time], data[lag_time:]


def create_timelagged_dataset_multi(
    blocks: list, lag_time: int = 1
) -> Tuple[np.ndarray, np.ndarray]:
    """Time-lagged pairs per contiguous block (no pairs across trajectory
    boundaries), concatenated."""
    xs, ys = [], []
    for block in blocks:
        if block.shape[0] > lag_time:
            x, y = create_timelagged_dataset(block, lag_time)
            xs.append(x)
            ys.append(y)
    if not xs:
        raise ValueError("No block has more than lag_time samples")
    return np.concatenate(xs), np.concatenate(ys)


@jax.jit
def timelagged_covariances(
    x_t: jnp.ndarray, x_lag: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """C0, symmetrized Ctau, and the removed mean — mlcolvar's estimator
    (the reference's TICA.compute): the mean AND C0 come from x_t only,
    x_lag is centered with x_t's mean, and only Ctau is symmetrized.
    Verified against the reference's committed TICA training output
    (reproduces tests/data/reference/train_colvars/tica_*.csv to 1e-4)."""
    n = x_t.shape[0]
    mu = jnp.mean(x_t, axis=0)
    a = x_t - mu
    b = x_lag - mu
    c0 = a.T @ a / n
    ctau = 0.5 * (a.T @ b + b.T @ a) / n
    return c0, ctau, mu


def generalized_eigh(
    a: jnp.ndarray, b: jnp.ndarray, reg: float = 1e-6
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Solve a v = w b v for symmetric a, SPD b, via Cholesky whitening.

    Returns eigenvalues descending and eigenvectors (columns) with
    v^T b v = 1.
    """
    dim = b.shape[0]
    b_reg = b + reg * jnp.eye(dim, dtype=b.dtype)
    chol = jnp.linalg.cholesky(b_reg)
    li = jax.scipy.linalg.solve_triangular(chol, jnp.eye(dim, dtype=b.dtype), lower=True)
    a_white = li @ a @ li.T
    w, u = jnp.linalg.eigh(a_white)
    # ascending -> descending
    w = w[::-1]
    u = u[:, ::-1]
    v = li.T @ u
    return w, v


def _fix_sign(evecs: np.ndarray) -> np.ndarray:
    """Deterministic sign: the largest-magnitude component of each
    eigenvector is positive."""
    idx = np.argmax(np.abs(evecs), axis=0)
    signs = np.sign(evecs[idx, np.arange(evecs.shape[1])])
    signs[signs == 0] = 1.0
    return evecs * signs


def tica(
    x_t: np.ndarray,
    x_lag: np.ndarray,
    out_features: int,
    reg: float = 1e-6,
    remove_average: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """TICA eigenvalues (descending) and eigenvectors (features, out)."""
    xt = jnp.asarray(x_t, jnp.float32)
    xl = jnp.asarray(x_lag, jnp.float32)
    if remove_average:
        c0, ctau, _ = timelagged_covariances(xt, xl)
    else:
        n = xt.shape[0]
        c0 = xt.T @ xt / n
        ctau = 0.5 * (xt.T @ xl + xl.T @ xt) / n
    w, v = generalized_eigh(ctau, c0, reg)
    evals = np.asarray(w)[:out_features]
    evecs = _fix_sign(np.asarray(v)[:, :out_features])
    return evals, evecs


def tica_sharded(
    x_t: np.ndarray,
    x_lag: np.ndarray,
    out_features: int,
    mesh=None,
    reg: float = 1e-6,
) -> Tuple[np.ndarray, np.ndarray]:
    """Frame-sharded TICA: covariance accumulation is an embarrassingly
    reducible psum over the frame axis of the device mesh (see parallel/)."""
    from deep_cartograph_tpu.parallel.sharding import sharded_covariances

    c0, ctau = sharded_covariances(x_t, x_lag, mesh=mesh)
    w, v = generalized_eigh(jnp.asarray(ctau), jnp.asarray(c0), reg)
    return np.asarray(w)[:out_features], _fix_sign(
        np.asarray(v)[:, :out_features]
    )


def split_subspaces(n_features: int, num_subspaces: int) -> list:
    """Column index blocks replicating torch.split(split_size=n//k) semantics
    used by the reference HTICA (cv_calculator.py:2330-2337): fixed block
    size n//k, with a smaller trailing block if k does not divide n."""
    split_size = n_features // num_subspaces
    if split_size == 0:
        raise ValueError(
            f"Number of subspaces {num_subspaces} is larger than number of "
            f"features {n_features}."
        )
    blocks = []
    start = 0
    while start < n_features:
        stop = min(start + split_size, n_features)
        blocks.append(np.arange(start, stop))
        start = stop
    return blocks
