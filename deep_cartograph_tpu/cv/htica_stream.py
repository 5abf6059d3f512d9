"""Streaming hierarchical TICA for feature matrices too large for memory.

BASELINE config 5 scale (100k frames x 50k features = 20 GB fp32) cannot
hold the feature matrix in HBM or host RAM at once. This module runs the
HTICA recipe (cf. cv/linear.py HTICACalculator and reference
cv_calculator.py:2269-2384) over a BLOCK ITERATOR of frames:

  pass 1: accumulate per-subspace raw moments (sums + second moments of
          x_t / x_lag) block by block — each block contributes one batched
          einsum over (S, block, D) on the MXU; a `lag`-frame carry forms
          the time-lagged pairs that straddle block boundaries.
  eigh:   per-subspace generalized eigensolves (vmapped, level 1).
  pass 2: re-stream the blocks, project through the level-1 transform, and
          accumulate the level-2 time-lagged covariances in the projected
          (num_subspaces * dim) space; solve level 2.

The estimator matches cv/tica_math.timelagged_covariances (mean and C0 from
x_t only, Ctau symmetrized), so results agree with the in-memory
HTICACalculator on data that fits (tested).

Blocks may be host numpy arrays or device arrays (e.g. generated on device
by a featurization stage); all accumulation happens on device.
"""

from __future__ import annotations

import logging
import time
from functools import partial
from typing import Callable, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deep_cartograph_tpu.cv.tica_math import generalized_eigh

logger = logging.getLogger(__name__)


@partial(jax.jit, static_argnames=("n_sub", "sub_d"))
def _accumulate_moments(state, x_t, x_lag, n_sub: int, sub_d: int,
                        shift=None):
    """Add one block of time-lagged pairs to the per-subspace raw moments.

    x_t/x_lag: (b, n_sub * sub_d). state: dict of per-subspace sums.
    `shift` (optional, (F,)) is subtracted INSIDE the program — callers
    passing it avoid materializing two shifted copies of the block as
    separate eager ops.
    """
    if shift is not None:
        x_t = x_t - shift
        x_lag = x_lag - shift
    b = x_t.shape[0]
    xt = x_t.reshape(b, n_sub, sub_d)
    xl = x_lag.reshape(b, n_sub, sub_d)
    return {
        "n": state["n"] + b,
        "s1": state["s1"] + jnp.sum(xt, axis=0),            # (S, D)
        "s1l": state["s1l"] + jnp.sum(xl, axis=0),          # (S, D)
        "s0": state["s0"] + jnp.einsum("bsd,bse->sde", xt, xt),
        "st": state["st"] + 0.5 * (
            jnp.einsum("bsd,bse->sde", xt, xl)
            + jnp.einsum("bsd,bse->sde", xl, xt)
        ),
    }


def _pair_moments(x_t, x_lag, n_sub: int, sub_d: int):
    """Raw moments of ONE group of time-lagged pairs (no accumulation).

    Same pytree layout as the running state so callers can weight it
    (e.g. mask a boundary seam out of the first dispatch) and tree-add it
    onto the accumulator.
    """
    b = x_t.shape[0]
    xt = x_t.reshape(b, n_sub, sub_d)
    xl = x_lag.reshape(b, n_sub, sub_d)
    return {
        "n": jnp.asarray(b, jnp.float32),
        "s1": jnp.sum(xt, axis=0),
        "s1l": jnp.sum(xl, axis=0),
        "s0": jnp.einsum("bsd,bse->sde", xt, xt),
        "st": 0.5 * (
            jnp.einsum("bsd,bse->sde", xt, xl)
            + jnp.einsum("bsd,bse->sde", xl, xt)
        ),
    }


def _moments_to_covs(state):
    """Per-subspace (C0, Ctau) from raw moments, mlcolvar estimator
    (mean from x_t; x_lag centered with x_t's mean; Ctau symmetrized).

    With a = x_t - mu, b = x_lag - mu (mu from x_t only):
      C0   = S0/n - mu mu^T
      Ctau = 0.5(S_tl + S_lt)/n - 0.5(mu mul^T + mul mu^T)
    which is exactly timelagged_covariances' result, block-decomposed.
    """
    n = jnp.maximum(state["n"], 1)
    mu = state["s1"] / n                                    # (S, D)
    mul = state["s1l"] / n                                  # (S, D)
    c0 = state["s0"] / n - jnp.einsum("sd,se->sde", mu, mu)
    cross = 0.5 * (
        jnp.einsum("sd,se->sde", mu, mul) + jnp.einsum("sd,se->sde", mul, mu)
    )
    ctau = state["st"] / n - cross
    return c0, ctau, mu


def _zero_state(n_sub: int, sub_d: int):
    # s0/st must be DISTINCT buffers: fit_chunked donates the state pytree,
    # and donating one aliased buffer twice is an execution error.
    return {
        "n": jnp.zeros((), jnp.float32),
        "s1": jnp.zeros((n_sub, sub_d), jnp.float32),
        "s1l": jnp.zeros((n_sub, sub_d), jnp.float32),
        "s0": jnp.zeros((n_sub, sub_d, sub_d), jnp.float32),
        "st": jnp.zeros((n_sub, sub_d, sub_d), jnp.float32),
    }


@partial(jax.jit, static_argnames=("dim",))
def _batched_tica(c0, ctau, reg: float, dim: int):
    """vmapped generalized eigensolves: (S, D, D) -> (S, D, dim) leading
    eigenvectors + (S, dim) eigenvalues (descending)."""

    def solve(ct, c0_):
        w, v = generalized_eigh(ct, c0_, reg)
        return w[:dim], v[:, :dim]

    return jax.vmap(solve)(ctau, c0)


# Large dense eigensolves cannot run as a device eigh: an eigh at D~1000
# is O(D^3)=1e9 FLOPs — milliseconds anywhere — while its accelerator
# program is enormous to compile (measured: 237 s remote compile for ONE
# 1000x1000 eigh through this environment's compile service, and the
# vmapped batch crashed the worker). Two replacements below, chosen by
# _run_batched_tica:
#   device Krylov (default for top-k << D): whitening + block-Krylov
#     projection on the MXU (cholesky/trsm/matmul only — compiles in 11.5 s
#     where eigh took 237 s), tiny (q x q) projected problem solved exactly
#     on the host. Pulls ~2 MB; measured 0.5 s warm at config-5 level-1
#     shape (50 x 1000 x 1000, k=5) vs 9.5 s for the host pull+solve.
#   host LAPACK (fallback, and the wide-dim path): pull packed covariance
#     triangles and run the generalized subset driver (sygvx) for the
#     top-k pairs only — at config-5 shape that is 4.2 s of solves under a
#     ~9 s transfer vs 24.4 s for whitening+full-eigh on the XLA CPU
#     backend; the full spectrum is 998 discarded columns.
_EIGH_HOST_DIM_THRESHOLD = 256


# device tril gather indices, cached per matrix dim (passed as jit
# ARGUMENTS — embedding them as program constants would bloat the lowered
# module by MBs, cf. geom/kernels._evaluate_plan_chunk's constant rule)
_TRIL_IDX_CACHE: dict = {}


def _tril_device_indices(d: int):
    if d not in _TRIL_IDX_CACHE:
        rows, cols = np.tril_indices(d)
        _TRIL_IDX_CACHE[d] = (
            jax.device_put(rows.astype(np.int32)),
            jax.device_put(cols.astype(np.int32)),
        )
    return _TRIL_IDX_CACHE[d]


@jax.jit
def _pack_tril_pair(c0, ctau, rows, cols):
    """(S, D, D) x2 symmetric -> (S, 2, D(D+1)/2) packed lower triangles.
    Both covariances are symmetric, so the device->host transfer for the
    host eigensolve only needs HALF the matrix — at config-5 scale that
    is 200 MB instead of 400 MB over the tunnel."""
    return jnp.stack([c0[:, rows, cols], ctau[:, rows, cols]], axis=1)


def _scipy_batched_tica_packed(packed: np.ndarray, d: int, reg: float,
                               dim: int):
    """Host LAPACK top-k generalized eigensolve from packed lower
    triangles, matching _batched_tica's contract exactly: descending
    eigenvalues, eigenvectors normalized in the regularized-C0 metric
    (v^T (C0 + reg I) v = 1, LAPACK's sygvx normalization ==
    generalized_eigh's Cholesky whitening). sygvx with uplo='L' never
    reads the upper triangles, so only the tril is reconstructed."""
    import scipy.linalg as sla

    n_sub = packed.shape[0]
    k = min(dim, d)
    rows, cols = np.tril_indices(d)
    diag = np.arange(d)
    a = np.zeros((d, d), packed.dtype)
    b = np.zeros((d, d), packed.dtype)
    ws = np.empty((n_sub, k), packed.dtype)
    vs = np.empty((n_sub, d, k), packed.dtype)
    for s in range(n_sub):
        a[rows, cols] = packed[s, 1]  # ctau
        b[rows, cols] = packed[s, 0]  # c0
        b[diag, diag] += reg
        w, v = sla.eigh(
            a, b, lower=True,
            subset_by_index=[d - k, d - 1],
            check_finite=False,
        )
        ws[s] = w[::-1]  # LAPACK ascending -> descending
        vs[s] = v[:, ::-1]
    return ws, vs


def host_topk_eigh(cov: np.ndarray, k: int):
    """Top-k (eigenvalues ascending, LAPACK order) of ONE symmetric matrix
    on the host via the subset driver (syevr) — the standard-eigenproblem
    sibling of the generalized path above, for callers (e.g. PCA) whose
    matrix dim exceeds _EIGH_HOST_DIM_THRESHOLD. Returns (w, v) with
    w ascending, v columns matching w."""
    import scipy.linalg as sla

    d = cov.shape[-1]
    k = min(k, d)
    return sla.eigh(
        np.asarray(cov), subset_by_index=[d - k, d - 1], check_finite=False
    )


@partial(jax.jit, static_argnames=("blk", "m"))
def _krylov_project(c0, ctau, reg: float, blk: int, m: int):
    """Device side of the top-k generalized eigensolve for LARGE subspaces:
    project (Ctau, C0+reg I) onto a block-Krylov subspace so the host only
    solves a tiny dense problem.

    (S, D, D) x2 -> H (S, q, q), G (S, q, q), Q (S, D, q), L (S, D, D)
    with q = blk * m. Steps, all batched over S on the MXU:

      L = chol(C0 + reg I); M = L^{-1} Ctau L^{-T} (symmetrized) — the
      whitened operator, whose eigenvalues are the generalized ones.
      Q = [Z, MZ, M^2 Z, ...] block-Krylov basis from a fixed seeded start
      (Krylov spaces are shift-invariant, so the indefinite spectrum needs
      no shift estimate). Each new block is Gram-Schmidt-orthogonalized
      against the accumulated basis twice and Cholesky-QR-normalized — for
      CONDITIONING only: the host solves the projected problem in its
      actual metric (H = Q^T M Q vs G = Q^T Q), so f32 orthonormality loss
      cannot bias the eigenvalues.

    Why this shape of work: the alternative is pulling both D x D
    covariances to the host (packed triangles are 191 MB at config-5
    scale, ~9 s through this tunnel) — here the pull is H+G, ~2 MB.
    """
    d = c0.shape[-1]
    eye = jnp.eye(d, dtype=c0.dtype)
    ell = jax.lax.linalg.cholesky(c0 + reg * eye)
    # M = L^{-1} Ctau L^{-T}: two batched triangular solves
    y = jax.lax.linalg.triangular_solve(
        ell, ctau, left_side=True, lower=True
    )
    mw = jax.lax.linalg.triangular_solve(
        ell, jnp.swapaxes(y, -1, -2), left_side=True, lower=True
    )
    mw = 0.5 * (mw + jnp.swapaxes(mw, -1, -2))

    q_cols = blk * m
    s = c0.shape[0]
    z0 = jax.random.normal(
        jax.random.PRNGKey(0), (s, d, blk), dtype=c0.dtype
    )

    def _chol_qr(w):
        g = jnp.einsum("sdi,sdj->sij", w, w)
        g = g + 1e-6 * jnp.trace(g, axis1=-2, axis2=-1)[:, None, None] \
            * jnp.eye(blk, dtype=w.dtype) / blk
        r = jax.lax.linalg.cholesky(g)
        return jax.lax.linalg.triangular_solve(
            r, w, left_side=False, lower=True, transpose_a=True
        )

    def body(j, carry):
        basis, prev = carry
        w = jnp.einsum("sde,sei->sdi", mw, prev)
        for _ in range(2):  # twice-is-enough Gram-Schmidt vs the basis
            coef = jnp.einsum("sdq,sdi->sqi", basis, w)
            w = w - jnp.einsum("sdq,sqi->sdi", basis, coef)
        w = _chol_qr(w)
        basis = jax.lax.dynamic_update_slice(basis, w, (0, 0, j * blk))
        return basis, w

    z0 = _chol_qr(z0)
    basis0 = jnp.zeros((s, d, q_cols), c0.dtype)
    basis0 = jax.lax.dynamic_update_slice(basis0, z0, (0, 0, 0))
    basis, _ = jax.lax.fori_loop(1, m, body, (basis0, z0))

    mq = jnp.einsum("sde,seq->sdq", mw, basis)
    h = jnp.einsum("sdp,sdq->spq", basis, mq)
    g = jnp.einsum("sdp,sdq->spq", basis, basis)
    return 0.5 * (h + jnp.swapaxes(h, -1, -2)), \
        0.5 * (g + jnp.swapaxes(g, -1, -2)), basis, ell


@jax.jit
def _krylov_assemble(basis, ell, u):
    """V = L^{-T} (Q U): lift the host-solved projected eigenvectors back
    to the original coordinates. U^T G U = I on the host side guarantees
    V^T (C0 + reg I) V = I — the same B-metric normalization as the dense
    and LAPACK paths."""
    qu = jnp.einsum("sdq,sqk->sdk", basis, u)
    return jax.lax.linalg.triangular_solve(
        ell, qu, left_side=True, lower=True, transpose_a=True
    )


def _device_krylov_tica(c0, ctau, reg: float, dim: int):
    """Top-`dim` generalized eigenpairs of (Ctau, C0 + reg I) with the
    heavy work on the accelerator and only O(q^2) bytes on the wire."""
    import scipy.linalg as sla

    d = int(c0.shape[-1])
    blk = max(dim + 3, 8)
    # Krylov DEPTH m sets the polynomial degree (the convergence lever for
    # clustered slow modes); width blk only needs to cover degeneracy.
    # Measured on AR-like spectra at D=1000: m=8 leaves ~1e-3 low bias on
    # the Ritz values, m=16 converges to the f32 floor.
    q_cols = min(d, max(16 * dim, 128))
    m = max(2, -(-q_cols // blk))
    t0 = time.time()
    h, g, basis, ell = _krylov_project(c0, ctau, reg, blk, m)
    h_h = np.asarray(h, np.float64)
    g_h = np.asarray(g, np.float64)
    t_dev = time.time() - t0
    n_sub, q = h_h.shape[0], h_h.shape[-1]
    ws = np.empty((n_sub, dim), np.float32)
    us = np.empty((n_sub, q, dim), np.float32)
    t0 = time.time()
    ridge = 1e-10 * np.eye(q)
    for s in range(n_sub):
        # tiny ridge: if the Krylov space saturated early (low-rank
        # operator), G is near-singular and LAPACK's Cholesky would fail
        w, v = sla.eigh(
            h_h[s], g_h[s] + np.trace(g_h[s]) * ridge, check_finite=False
        )
        ws[s] = w[-dim:][::-1]
        us[s] = v[:, -dim:][:, ::-1]
    t_small = time.time() - t0
    vs = np.asarray(_krylov_assemble(basis, ell, jnp.asarray(us)))
    logger.info(
        "batched TICA solve (device Krylov top-%d of %d x %dx%d, q=%d): "
        "project+pull %.2fs, host %dx%d solves %.2fs",
        dim, n_sub, d, d, q, t_dev, q, q, t_small,
    )
    return ws, vs


def _run_batched_tica(c0, ctau, reg: float, dim: int):
    import os

    d = c0.shape[-1]
    if d <= _EIGH_HOST_DIM_THRESHOLD:
        return _batched_tica(c0, ctau, reg, dim)
    solver = os.environ.get("DC_HTICA_SOLVER", "auto")
    # auto: the Krylov projection is exact to f32 when the subspace is a
    # healthy multiple of the wanted pairs; very large `dim` degenerates
    # toward a full solve, where LAPACK on the packed pull wins.
    if solver == "device" or (solver == "auto" and 8 * dim <= d):
        return _device_krylov_tica(c0, ctau, reg, dim)
    rows, cols = _tril_device_indices(d)
    n_sub, k = c0.shape[0], min(dim, d)
    packed_dev = _pack_tril_pair(c0, ctau, rows, cols)  # (S, 2, T)
    # Pipeline the device->host transfer with the per-subspace solves:
    # queue async D2H copies for every subspace group up front, then solve
    # each group as it lands — the LAPACK time rides inside the transfer
    # of the remaining groups (transfer is the bound: ~9 s for 191 MB at
    # config-5 scale vs ~4 s of solves).
    group = max(1, -(-n_sub // 8))
    slices = [
        packed_dev[i : i + group] for i in range(0, n_sub, group)
    ]
    for s in slices:
        try:
            s.copy_to_host_async()
        except AttributeError:  # backend without async D2H: plain pull below
            break
    ws = np.empty((n_sub, k), np.float32)
    vs = np.empty((n_sub, d, k), np.float32)
    t0 = time.time()
    t_solve = 0.0
    mb = 0.0
    for gi, s in enumerate(slices):
        arr = np.asarray(s)
        mb += arr.nbytes / 2**20
        t1 = time.time()
        w_g, v_g = _scipy_batched_tica_packed(arr, d, reg, dim)
        t_solve += time.time() - t1
        ws[gi * group : gi * group + arr.shape[0]] = w_g
        vs[gi * group : gi * group + arr.shape[0]] = v_g
    total = time.time() - t0
    logger.info(
        "batched TICA solve (host top-%d of %d x %dx%d): tril pull %.0f MB "
        "+ solve pipelined %.2fs (solve %.2fs overlapped)",
        k, n_sub, d, d, mb, total, t_solve,
    )
    return ws, vs


class StreamingHTICA:
    """Two-pass streaming HTICA over a restartable block iterator.

    Pass ``mesh`` to shard the SUBSPACE axis over a device mesh: each device
    accumulates the moments of its own subspaces (blocks arrive
    feature-sharded, the batched moment einsum partitions along S with zero
    communication), and only the tiny level-2 projected covariance crosses
    devices. This is BASELINE config 5's multi-chip decomposition: the
    feature axis is the scaling axis, frames stream.
    """

    def __init__(
        self,
        n_features: int,
        num_subspaces: int,
        subspaces_dimension: int,
        cv_dimension: int,
        lag_time: int,
        reg: float = 1e-6,
        mesh=None,
    ):
        if n_features % num_subspaces != 0:
            raise ValueError(
                f"n_features ({n_features}) must divide evenly into "
                f"{num_subspaces} subspaces for the streaming path."
            )
        if lag_time < 1:
            raise ValueError(
                f"lag_time must be a positive integer, got {lag_time} "
                "(same contract as tica_math.create_timelagged_dataset)."
            )
        self.n_features = n_features
        self.n_sub = num_subspaces
        self.sub_d = n_features // num_subspaces
        self.sub_out = min(subspaces_dimension, self.sub_d)
        self.cv_dim = cv_dimension
        self.lag = lag_time
        self.reg = reg
        self.level1: Optional[np.ndarray] = None   # (S, D, sub_out)
        self.weights: Optional[np.ndarray] = None  # (F, cv_dim)
        self.eigenvalues_: Optional[np.ndarray] = None
        self.mesh = mesh
        self._block_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            n_dev = mesh.devices.size
            if self.n_sub % n_dev != 0:
                raise ValueError(
                    f"num_subspaces ({self.n_sub}) must divide evenly over "
                    f"the {n_dev}-device mesh (contiguous feature shards "
                    f"must align with subspace boundaries)."
                )
            # Shard the feature axis; contiguous shards hold whole subspaces,
            # so the batched (S, D, D) moment einsums partition along S with
            # no communication.
            self._block_sharding = NamedSharding(
                mesh, P(None, mesh.axis_names[0])
            )

    def _stream_pairs(self, block_iter: Iterable):
        """Yield (x_t, x_lag) device pairs with a lag-frame carry so pairs
        straddling block boundaries are not lost.

        A ``None`` item is a SEGMENT BREAK (e.g. a trajectory-file
        boundary): it resets the carry, so no time-lagged pair is formed
        across it — the same per-trajectory pairing contract as
        cv/tica_math.create_timelagged_dataset_multi.

        Uniform blocks longer than the lag yield TWO pairs per block —
        the (lag, F) boundary seam against the carry, then the block's
        interior — instead of concatenating carry+block: at production
        widths the concatenate materializes a full extra block of HBM
        traffic per step for the sake of lag rows. The pair SET is
        identical (seam j<lag: (carry[j], block[j]); interior j:
        (block[j], block[j+lag])). Ragged/short blocks and the sharded
        path keep the concat formulation.
        """
        lag = self.lag
        carry = None
        for block in block_iter:
            if block is None:  # segment break: no pairs across it
                carry = None
                continue
            if self._block_sharding is not None:
                # device_put the host array straight into the sharding —
                # jnp.asarray first would commit the whole block to one
                # device before resharding (a full extra transfer per block
                # at config-5 scale).
                if isinstance(block, np.ndarray):
                    block = np.ascontiguousarray(block, np.float32)
                else:
                    block = jnp.asarray(block, jnp.float32)
                block = jax.device_put(block, self._block_sharding)
            else:
                block = jnp.asarray(block, jnp.float32)
            if (
                self._block_sharding is None
                and block.shape[0] > lag
                and (carry is None or carry.shape[0] == lag)
            ):
                if carry is not None:
                    yield carry, block[:lag]
                yield block[:-lag], block[lag:]
                carry = block[-lag:]
                continue
            if carry is not None:
                block = jnp.concatenate([carry, block], axis=0)
            if block.shape[0] > lag:
                yield block[:-lag], block[lag:]
            carry = block[-lag:]

    def fit(self, make_block_iter: Callable[[], Iterable]) -> None:
        """make_block_iter: zero-arg callable returning a fresh iterator of
        (block_frames, n_features) arrays (called once per pass). ``None``
        items are segment breaks — the lag carry resets, so pairs never
        straddle them (multi-trajectory streams)."""
        # ---- pass 1: per-subspace moments -> level-1 eigenvectors ----
        # Raw second moments in f32 cancel catastrophically when feature
        # means dominate their variance (S0/n ~ mu^2 + tiny) — producing
        # non-PSD C0 and NaN eigensolves at production scales. Shift-center
        # every block by the FIRST block's mean (covariances are
        # shift-invariant), which keeps the accumulated moments O(variance).
        shift = None
        state = _zero_state(self.n_sub, self.sub_d)
        for x_t, x_lag in self._stream_pairs(make_block_iter()):
            if shift is None:
                shift = jnp.mean(x_t, axis=0)
            state = _accumulate_moments(
                state, x_t, x_lag, self.n_sub, self.sub_d, shift=shift
            )
        c0, ctau, _ = _moments_to_covs(state)
        evals1, evecs1 = _run_batched_tica(c0, ctau, self.reg, self.sub_out)
        self.level1 = np.asarray(evecs1)
        logger.info(
            "StreamingHTICA level 1: %d subspaces x %d -> %d dims "
            "(top eigenvalue %.4f)",
            self.n_sub, self.sub_d, self.sub_out, float(evals1[:, 0].max()),
        )

        # ---- pass 2: level-2 covariances in the projected space ----
        evecs1_d = jnp.asarray(self.level1)
        z_dim = self.n_sub * self.sub_out

        @jax.jit
        def project(x):
            xs = x.reshape(x.shape[0], self.n_sub, self.sub_d)
            return jnp.einsum("bsd,sdo->bso", xs, evecs1_d).reshape(
                x.shape[0], z_dim
            )

        shift2 = None
        state2 = _zero_state(1, z_dim)
        for x_t, x_lag in self._stream_pairs(make_block_iter()):
            z_t, z_lag = project(x_t), project(x_lag)
            if shift2 is None:
                shift2 = jnp.mean(z_t, axis=0)
            state2 = _accumulate_moments(
                state2, z_t, z_lag, 1, z_dim, shift=shift2
            )
        c0_2, ctau_2, _ = _moments_to_covs(state2)
        w2a, v2a = _run_batched_tica(c0_2, ctau_2, self.reg, c0_2.shape[-1])
        w2, v2 = w2a[0], v2a[0]
        self.eigenvalues_ = np.asarray(w2[: self.cv_dim])
        level2 = np.asarray(v2[:, : self.cv_dim])

        # W = blockdiag(level1) @ level2 without materializing the block
        # diagonal: reshape level2 to (S, sub_out, cv_dim) and contract.
        l2 = level2.reshape(self.n_sub, self.sub_out, self.cv_dim)
        weights = np.einsum("sdo,soc->sdc", self.level1, l2)
        self.weights = weights.reshape(self.n_features, self.cv_dim)

    def fit_fused(self, block_fn, n_frames: int, block_size: int) -> None:
        """Single-dispatch-per-pass fit for TRACEABLE block generators.

        block_fn(start) -> (block_size, n_features) array, traceable under
        jit (on-device synthetic generators, or device-resident
        featurization of device-resident coordinates — e.g. a
        PlanEvaluator program composed with a coordinate source). Each of
        the two covariance passes compiles to ONE XLA program
        (lax.fori_loop over blocks) with zero per-block dispatches.
        Matches fit()'s estimator exactly (same lag-carry pairing, same
        first-block shift; parity test in tests/test_htica_stream.py).

        Trade-off, measured at BASELINE config-5 scale: fit()'s eager
        per-block dispatches PIPELINE well under JAX async dispatch, so
        the fused path's win is not dispatch latency — it is one
        self-contained program (useful for ahead-of-time compilation and
        for composing the whole pass into larger programs). On backends
        with expensive/slow compilation the two big fused programs can
        cost more to build than they save; fit() remains the default.
        """
        if n_frames % block_size != 0:
            raise ValueError(
                "n_frames must divide evenly into block_size blocks for "
                "the fused path."
            )
        n_blocks = n_frames // block_size
        if block_size <= self.lag:
            raise ValueError("block_size must exceed lag_time.")
        lag, n_sub, sub_d = self.lag, self.n_sub, self.sub_d

        def pass1():
            blk0 = block_fn(0)
            shift = jnp.mean(blk0[: blk0.shape[0] - lag], axis=0)
            state = _accumulate_moments(
                _zero_state(n_sub, sub_d),
                blk0[:-lag] - shift, blk0[lag:] - shift, n_sub, sub_d,
            )

            def body(i, carry):
                state, carryblk = carry
                ext = jnp.concatenate([carryblk, block_fn(i * block_size)], 0)
                state = _accumulate_moments(
                    state, ext[:-lag] - shift, ext[lag:] - shift,
                    n_sub, sub_d,
                )
                return state, ext[-lag:]

            state, _ = jax.lax.fori_loop(
                1, n_blocks, body, (state, blk0[-lag:])
            )
            return state

        state = jax.jit(pass1)()
        c0, ctau, _ = _moments_to_covs(state)
        evals1, evecs1 = _run_batched_tica(c0, ctau, self.reg, self.sub_out)
        self.level1 = np.asarray(evecs1)
        logger.info(
            "StreamingHTICA (fused) level 1: %d subspaces x %d -> %d dims "
            "(top eigenvalue %.4f)",
            self.n_sub, self.sub_d, self.sub_out, float(evals1[:, 0].max()),
        )

        evecs1_d = jnp.asarray(self.level1)
        z_dim = self.n_sub * self.sub_out

        def project(x):
            xs = x.reshape(x.shape[0], self.n_sub, self.sub_d)
            return jnp.einsum("bsd,sdo->bso", xs, evecs1_d).reshape(
                x.shape[0], z_dim
            )

        def pass2():
            blk0 = block_fn(0)
            z0 = project(blk0)
            shift2 = jnp.mean(z0[: z0.shape[0] - lag], axis=0)
            state = _accumulate_moments(
                _zero_state(1, z_dim),
                z0[:-lag] - shift2, z0[lag:] - shift2, 1, z_dim,
            )

            def body(i, carry):
                state, carryblk = carry
                ext = jnp.concatenate(
                    [carryblk, project(block_fn(i * block_size))], 0
                )
                state = _accumulate_moments(
                    state, ext[:-lag] - shift2, ext[lag:] - shift2, 1, z_dim
                )
                return state, ext[-lag:]

            state, _ = jax.lax.fori_loop(1, n_blocks, body, (state, z0[-lag:]))
            return state

        state2 = jax.jit(pass2)()
        c0_2, ctau_2, _ = _moments_to_covs(state2)
        w2a, v2a = _run_batched_tica(c0_2, ctau_2, self.reg, c0_2.shape[-1])
        w2, v2 = w2a[0], v2a[0]
        self.eigenvalues_ = np.asarray(w2[: self.cv_dim])
        level2 = np.asarray(v2[:, : self.cv_dim])
        l2 = level2.reshape(self.n_sub, self.sub_out, self.cv_dim)
        weights = np.einsum("sdo,soc->sdc", self.level1, l2)
        self.weights = weights.reshape(self.n_features, self.cv_dim)

    def fit_chunked(
        self,
        block_fn,
        n_frames: int,
        block_size: int,
        blocks_per_dispatch: int = 8,
        block_args: tuple = (),
    ) -> None:
        """Middle ground between ``fit`` (one eager dispatch chain per
        block) and ``fit_fused`` (a whole covariance pass in one program):
        each dispatch executes ``blocks_per_dispatch`` blocks through a
        ``lax.fori_loop``, so per-dispatch overhead amortizes K-fold while
        the compiled program stays a constant K-block size (the scan body
        compiles ONCE regardless of K — compile cost does not grow toward
        the fused path's whole-pass program).

        ``block_fn(start, *block_args)`` must be traceable with a TRACED
        start (e.g. a ``lax.dynamic_slice`` featurization of
        device-resident coordinates) and return a
        ``(block_size, n_features)`` block. Any device array the block
        evaluation needs (the coordinate buffer, featurization plan
        arrays, ...) MUST ride in ``block_args`` — a pytree passed to the
        chunk program as traced jit ARGUMENTS — not be closed over by
        ``block_fn``: a closure-captured array is baked into the lowered
        module as a dense XLA constant (a 384 MB coordinate buffer
        becomes a 384 MB program), which this project's remote-compile
        environment cannot afford (see geom/kernels._evaluate_plan_chunk's
        docstring for the same rule). Matches ``fit``'s estimator
        exactly (same first-block shift, same lag-frame seam pairs across
        block boundaries; parity tests in tests/test_htica_stream.py).
        Boundary seams are handled uniformly inside the program: each body
        step accumulates the (lag,)-row seam against the carried tail
        weighted by a has-carry flag that is 0.0 only for the very first
        block, so every dispatch runs the same executable.
        """
        if n_frames % block_size != 0:
            raise ValueError(
                "n_frames must divide evenly into block_size blocks for "
                "the chunked path."
            )
        n_blocks = n_frames // block_size
        k = min(int(blocks_per_dispatch), n_blocks)
        if k < 1 or n_blocks % k != 0:
            raise ValueError(
                f"blocks_per_dispatch ({blocks_per_dispatch}) must divide "
                f"the {n_blocks}-block pass evenly."
            )
        if block_size <= self.lag:
            raise ValueError("block_size must exceed lag_time.")
        lag = self.lag

        def make_chunk_program(n_sub: int, sub_d: int, project=None):
            # state/carry donated: the accumulator updates in place across
            # the eager chunk loop instead of doubling its footprint.
            @partial(jax.jit, donate_argnums=(0, 1))
            def chunk(state, carry, has, start, shift, bargs):
                def body(j, acc):
                    state, carry, has = acc
                    blk = block_fn(start + j * block_size, *bargs)
                    if project is not None:
                        blk = project(blk)
                    blk = blk - shift
                    seam = _pair_moments(carry, blk[:lag], n_sub, sub_d)
                    state = jax.tree.map(
                        lambda s, d: s + has * d, state, seam
                    )
                    state = jax.tree.map(
                        lambda s, d: s + d,
                        state,
                        _pair_moments(blk[:-lag], blk[lag:], n_sub, sub_d),
                    )
                    return state, blk[-lag:], jnp.float32(1.0)

                return jax.lax.fori_loop(
                    0, k, body, (state, carry, has)
                )

            return chunk

        def run_pass(n_sub: int, sub_d: int, shift, project=None):
            chunk = make_chunk_program(n_sub, sub_d, project)
            state = _zero_state(n_sub, sub_d)
            carry = jnp.zeros((lag, n_sub * sub_d), jnp.float32)
            has = jnp.float32(0.0)
            for cstart in range(0, n_blocks, k):
                state, carry, has = chunk(
                    state, carry, has,
                    jnp.int32(cstart * block_size), shift, block_args,
                )
            return state

        # ---- pass 1 ----
        # The first block is evaluated eagerly ONLY to compute each pass's
        # shift, and freed immediately: at production scale one block is
        # hundreds of MB of HBM, too much to pin across a whole pass.
        blk0 = block_fn(0, *block_args)
        shift = jnp.mean(blk0[:-lag], axis=0)
        del blk0
        state = run_pass(self.n_sub, self.sub_d, shift)
        c0, ctau, _ = _moments_to_covs(state)
        evals1, evecs1 = _run_batched_tica(c0, ctau, self.reg, self.sub_out)
        self.level1 = np.asarray(evecs1)
        logger.info(
            "StreamingHTICA (chunked, %d blocks/dispatch) level 1: "
            "%d subspaces x %d -> %d dims (top eigenvalue %.4f)",
            k, self.n_sub, self.sub_d, self.sub_out,
            float(evals1[:, 0].max()),
        )

        # ---- pass 2 ----
        evecs1_d = jnp.asarray(self.level1)
        z_dim = self.n_sub * self.sub_out

        def project(x):
            xs = x.reshape(x.shape[0], self.n_sub, self.sub_d)
            return jnp.einsum("bsd,sdo->bso", xs, evecs1_d).reshape(
                x.shape[0], z_dim
            )

        blk0 = block_fn(0, *block_args)  # one extra dispatch, no residency
        shift2 = jnp.mean(project(blk0)[:-lag], axis=0)
        del blk0
        state2 = run_pass(1, z_dim, shift2, project=project)
        c0_2, ctau_2, _ = _moments_to_covs(state2)
        w2a, v2a = _run_batched_tica(c0_2, ctau_2, self.reg, c0_2.shape[-1])
        w2, v2 = w2a[0], v2a[0]
        self.eigenvalues_ = np.asarray(w2[: self.cv_dim])
        level2 = np.asarray(v2[:, : self.cv_dim])
        l2 = level2.reshape(self.n_sub, self.sub_out, self.cv_dim)
        weights = np.einsum("sdo,soc->sdc", self.level1, l2)
        self.weights = weights.reshape(self.n_features, self.cv_dim)

    def project_blocks(self, block_iter: Iterable) -> np.ndarray:
        """Project streamed blocks through the final weights."""
        # Cache the jitted projection across calls (jit caches on function
        # identity; a fresh lambda per call would recompile every time —
        # minutes through a remote-compile service). The cache key holds a
        # STRONG reference to the weights array and compares with `is`:
        # id() of a freed array can be reused by a refit's new allocation,
        # which would silently serve the old weights.
        if (
            getattr(self, "_proj_fn", None) is None
            or self._proj_weights_ref is not self.weights
        ):
            w = jnp.asarray(self.weights)
            self._proj_fn = jax.jit(lambda x: x @ w)
            self._proj_weights_ref = self.weights
        fn = self._proj_fn
        return np.concatenate(
            [np.asarray(fn(jnp.asarray(b, jnp.float32))) for b in block_iter]
        )
