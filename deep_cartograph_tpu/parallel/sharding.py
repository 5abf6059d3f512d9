"""Sharded compute paths: frame-axis covariance, lag halo exchange, sharded
featurization, and data-parallel training steps.

This is the TPU equivalent of a distributed backend (SURVEY §2.5/§5): no
NCCL/MPI is written — shardings are annotated and XLA emits psum/all-gather
over ICI.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from deep_cartograph_tpu.parallel.mesh import (
    FRAME_AXIS,
    frame_sharding,
    get_mesh,
    pad_to_multiple,
)


# Jitted shard_map programs cached per mesh: a fresh closure per call
# would re-trace and recompile identical-shape programs on every
# invocation (minutes each through a remote-compile service).
_PROGRAM_CACHE: dict = {}


def _covariance_programs(mesh: Mesh):
    key = ("cov", mesh)
    if key not in _PROGRAM_CACHE:

        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(FRAME_AXIS), P(FRAME_AXIS), P(FRAME_AXIS)),
            out_specs=(P(), P(), P()),
        )
        def partial_moments(a, b, wt):
            wcol = wt[:, None]
            s_a = jax.lax.psum(jnp.sum(a * wcol, axis=0), FRAME_AXIS)
            s_b = jax.lax.psum(jnp.sum(b * wcol, axis=0), FRAME_AXIS)
            count = jax.lax.psum(jnp.sum(wt), FRAME_AXIS)
            return s_a, s_b, count

        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(FRAME_AXIS), P(FRAME_AXIS), P(FRAME_AXIS), P()),
            out_specs=(P(), P()),
        )
        def partial_cov(a, b, wt, mean):
            ac = (a - mean) * wt[:, None]
            bc = (b - mean) * wt[:, None]
            c0 = jax.lax.psum(ac.T @ ac, FRAME_AXIS)
            ctau = jax.lax.psum(ac.T @ bc + bc.T @ ac, FRAME_AXIS)
            return c0, ctau

        _PROGRAM_CACHE[key] = (jax.jit(partial_moments), jax.jit(partial_cov))
    return _PROGRAM_CACHE[key]


def sharded_covariances(
    x_t: np.ndarray,
    x_lag: np.ndarray,
    mesh: Optional[Mesh] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """(C0, symmetrized Ctau) with the frame axis sharded across the mesh,
    using mlcolvar's estimator (mean and C0 from x_t only; cf.
    cv/tica_math.timelagged_covariances).

    Per-shard partial sums are reduced with psum — the covariance is
    embarrassingly reducible along frames (SURVEY §2.5).
    """
    mesh = mesh or get_mesh()
    n_dev = mesh.devices.size
    xt, n = pad_to_multiple(np.asarray(x_t, np.float32), n_dev)
    xl, _ = pad_to_multiple(np.asarray(x_lag, np.float32), n_dev)
    # zero-weight the padded tail
    w = np.zeros(xt.shape[0], np.float32)
    w[:n] = 1.0

    sharding = frame_sharding(mesh)
    xt_d = jax.device_put(xt, sharding)
    xl_d = jax.device_put(xl, sharding)
    w_d = jax.device_put(w, sharding)

    moments_fn, cov_fn = _covariance_programs(mesh)
    s_a, s_b, count = moments_fn(xt_d, xl_d, w_d)
    mu = s_a / count
    c0, ctau = cov_fn(xt_d, xl_d, w_d, mu)
    c0 = np.asarray(c0) / float(count)
    ctau = 0.5 * np.asarray(ctau) / float(count)
    return c0, ctau


def lag_pairs_with_halo(
    frames: jnp.ndarray, lag_time: int, mesh: Mesh
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Build (x_t, x_lag) across shard boundaries via a halo exchange.

    Each shard sends its first `lag_time` frames to its left neighbor
    (ppermute), so every shard can pair all of its own frames except the
    global tail. Output stays frame-sharded; callers mask the final
    `lag_time` rows of the last shard (returned weights do this).
    """
    n_dev = mesh.devices.size
    key = ("halo", mesh, int(lag_time))
    if key not in _PROGRAM_CACHE:

        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(FRAME_AXIS),),
            out_specs=(P(FRAME_AXIS), P(FRAME_AXIS), P(FRAME_AXIS)),
        )
        def build(local):
            # halo: first lag rows of the RIGHT neighbor
            halo = jax.lax.ppermute(
                local[:lag_time],
                FRAME_AXIS,
                perm=[((i + 1) % n_dev, i) for i in range(n_dev)],
            )
            extended = jnp.concatenate([local, halo], axis=0)
            x_t = local
            x_lag = jax.lax.dynamic_slice_in_dim(
                extended, lag_time, local.shape[0], 0
            )
            # weights: last shard's tail pairs wrap around -> mask them
            idx = jax.lax.axis_index(FRAME_AXIS)
            row = jnp.arange(local.shape[0])
            valid = jnp.where(
                idx == n_dev - 1, row < local.shape[0] - lag_time, True
            ).astype(local.dtype)
            return x_t, x_lag, valid

        _PROGRAM_CACHE[key] = jax.jit(build)
    return _PROGRAM_CACHE[key](frames)


def sharded_feature_matrix_stats(
    features: np.ndarray, mesh: Optional[Mesh] = None
) -> dict:
    """mean/std/min/max across a frame-sharded feature matrix (psum/pmax)."""
    mesh = mesh or get_mesh()
    n_dev = mesh.devices.size
    x, n = pad_to_multiple(np.asarray(features, np.float32), n_dev)
    w = np.zeros(x.shape[0], np.float32)
    w[:n] = 1.0
    sharding = frame_sharding(mesh)
    x_d = jax.device_put(x, sharding)
    w_d = jax.device_put(w, sharding)

    key = ("stats", mesh)
    if key not in _PROGRAM_CACHE:

        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(FRAME_AXIS), P(FRAME_AXIS)),
            out_specs=(P(), P(), P(), P()),
        )
        def stats(xs, wt):
            wcol = wt[:, None]
            count = jax.lax.psum(jnp.sum(wt), FRAME_AXIS)
            s1 = jax.lax.psum(jnp.sum(xs * wcol, axis=0), FRAME_AXIS)
            s2 = jax.lax.psum(jnp.sum(xs * xs * wcol, axis=0), FRAME_AXIS)
            big = jnp.float32(3.4e38)
            xmin = jax.lax.pmin(
                jnp.min(jnp.where(wcol > 0, xs, big), axis=0), FRAME_AXIS
            )
            xmax = jax.lax.pmax(
                jnp.max(jnp.where(wcol > 0, xs, -big), axis=0), FRAME_AXIS
            )
            mean = s1 / count
            var = jnp.maximum(s2 / count - mean * mean, 0.0)
            return mean, jnp.sqrt(var), xmin, xmax

        _PROGRAM_CACHE[key] = jax.jit(stats)
    mean, std, xmin, xmax = _PROGRAM_CACHE[key](x_d, w_d)
    return {
        "mean": np.asarray(mean, np.float64),
        "std": np.asarray(std, np.float64),
        "min": np.asarray(xmin, np.float64),
        "max": np.asarray(xmax, np.float64),
    }


def feature_sharded_covariance_ring(
    features: np.ndarray,
    mesh: Optional[Mesh] = None,
    center: bool = True,
):
    """Covariance of a FEATURE-axis-sharded matrix via a ppermute ring.

    The tensor-parallel path for feature counts whose full (F, F) covariance
    and even the (N, F) matrix exceed one device's HBM (SURVEY §2.5 "TP":
    BASELINE config 5, 100k frames x 50k features). Each device holds a
    feature shard X_i (N, F/D) and the output row-block C[i] (F/D, F):

        C[i, j] = X_i^T X_j  — computed in D ring steps; at step s every
        device multiplies its resident shard by the visiting shard and
        ppermutes the visitor along the ring. Peak memory per device:
        2 shards + 1 row-block; ICI traffic: (D-1) shard-sized hops.

    Returns C row-sharded over the mesh axis as a jax.Array (n_frames
    normalization, mean-centered when `center`).
    """
    mesh = mesh or get_mesh()
    n_dev = mesh.devices.size
    x = np.asarray(features, np.float32)
    n, f = x.shape
    pad = (-f) % n_dev
    if pad:
        x = np.concatenate([x, np.zeros((n, pad), np.float32)], axis=1)
    fp = x.shape[1]
    sharding = NamedSharding(mesh, P(None, FRAME_AXIS))
    x_d = jax.device_put(x, sharding)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, FRAME_AXIS),),
        out_specs=P(FRAME_AXIS, None),
    )
    def ring_cov(xs):
        # xs: (N, F/D) local shard
        if center:
            local = xs - jnp.mean(xs, axis=0, keepdims=True)
        else:
            local = xs
        width = local.shape[1]
        my = jax.lax.axis_index(FRAME_AXIS)
        perm = [(d, (d - 1) % n_dev) for d in range(n_dev)]

        def body(s, carry):
            visitor, block = carry
            # visitor currently came from device (my + s) % n_dev
            src = (my + s) % n_dev
            contrib = local.T @ visitor / n
            block = jax.lax.dynamic_update_slice(
                block, contrib.T, (src * width, 0)
            )
            visitor = jax.lax.ppermute(visitor, FRAME_AXIS, perm)
            return visitor, block

        block0 = jnp.zeros((fp, width), jnp.float32)
        # The accumulator becomes device-varying after the first update;
        # mark it varying up front so the loop carry types line up.
        block0 = jax.lax.pcast(block0, (FRAME_AXIS,), to="varying")
        _, block = jax.lax.fori_loop(0, n_dev, body, (local, block0))
        # block holds C[:, my-columns] = (F, F/D); transpose to row-block
        return block.T

    return jax.jit(ring_cov)(x_d), fp


def feature_sharded_timelagged_ring(
    x_t: np.ndarray,
    x_lag: np.ndarray,
    mesh: Optional[Mesh] = None,
):
    """(C0, symmetrized Ctau) for TICA with the FEATURE axis sharded over
    the mesh — the ring form of `timelagged_covariances` for feature counts
    whose (N, F) matrix / (F, F) covariances exceed one device (BASELINE
    config 5). Both outputs come back row-sharded; both are symmetric, so
    the column-block each device accumulates doubles as its transposed
    row-block. Estimator matches tica_math.timelagged_covariances (mean and
    C0 from x_t only, Ctau symmetrized).
    """
    mesh = mesh or get_mesh()
    n_dev = mesh.devices.size
    a = np.asarray(x_t, np.float32)
    b = np.asarray(x_lag, np.float32)
    n, f = a.shape
    pad = (-f) % n_dev
    if pad:
        z = np.zeros((n, pad), np.float32)
        a = np.concatenate([a, z], axis=1)
        b = np.concatenate([b, z], axis=1)
    fp = a.shape[1]
    sharding = NamedSharding(mesh, P(None, FRAME_AXIS))
    a_d = jax.device_put(a, sharding)
    b_d = jax.device_put(b, sharding)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, FRAME_AXIS), P(None, FRAME_AXIS)),
        out_specs=(P(FRAME_AXIS, None), P(FRAME_AXIS, None)),
    )
    def ring(at, bl):
        mean = jnp.mean(at, axis=0)
        at = at - mean
        bl = bl - mean
        width = at.shape[1]
        my = jax.lax.axis_index(FRAME_AXIS)
        perm = [(d, (d - 1) % n_dev) for d in range(n_dev)]

        def body(s, carry):
            vt, vl, blk0, blkt = carry
            src = (my + s) % n_dev
            c0 = at.T @ vt / n
            ct = 0.5 * (at.T @ vl + bl.T @ vt) / n
            blk0 = jax.lax.dynamic_update_slice(blk0, c0.T, (src * width, 0))
            blkt = jax.lax.dynamic_update_slice(blkt, ct.T, (src * width, 0))
            vt = jax.lax.ppermute(vt, FRAME_AXIS, perm)
            vl = jax.lax.ppermute(vl, FRAME_AXIS, perm)
            return vt, vl, blk0, blkt

        zeros = jax.lax.pcast(
            jnp.zeros((fp, width), jnp.float32), (FRAME_AXIS,), to="varying"
        )
        _, _, blk0, blkt = jax.lax.fori_loop(
            0, n_dev, body, (at, bl, zeros, zeros)
        )
        return blk0.T, blkt.T

    c0, ctau = jax.jit(ring)(a_d, b_d)
    return c0, ctau, fp


# Compiled sharded-KDE programs, keyed by (mesh devices, padded shape, grid
# shape): compute_fes calls this once PER BOOTSTRAP BLOCK with identical
# shapes — a fresh closure per call would recompile every block (minutes
# through a remote-compile service).
_SHARDED_KDE_CACHE: dict = {}


def _get_sharded_kde(mesh: Mesh, x_shape, g_shape):
    key = (tuple(d.id for d in mesh.devices.flat), x_shape, g_shape)
    if key in _SHARDED_KDE_CACHE:
        return _SHARDED_KDE_CACHE[key]

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(FRAME_AXIS), P(FRAME_AXIS), P(), P()),
        out_specs=P(),
    )
    def kde(xs, wt, grid, inv_two_bw2):
        d2 = jnp.sum(
            (grid[:, None, :] - xs[None, :, :]) ** 2, axis=-1
        )  # (grid, local_samples)
        logk = -d2 * inv_two_bw2 + jnp.where(wt > 0, 0.0, -jnp.inf)[None, :]
        lse_local = jax.scipy.special.logsumexp(logk, axis=1)
        m = jax.lax.pmax(lse_local, FRAME_AXIS)
        total = jax.lax.psum(jnp.exp(lse_local - m), FRAME_AXIS)
        return m + jnp.log(total)

    fn = jax.jit(kde)
    _SHARDED_KDE_CACHE[key] = fn
    return fn


def sharded_kde_logdensity(
    samples: np.ndarray,
    grid_points: np.ndarray,
    bandwidth: float,
    mesh: Optional[Mesh] = None,
):
    """log KDE density on a replicated grid with SAMPLES frame-sharded.

    The FES ingredient at pod scale (SURVEY §2.5: KDE is frame-reducible):
    each device computes a partial logsumexp over its sample shard; shards
    combine with the numerically stable pmax/psum decomposition
        lse(all) = m + log(psum(exp(lse_local - m))),  m = pmax(lse_local).
    Padded samples carry -inf kernels. Returns log density (grid,) on host.
    """
    mesh = mesh or get_mesh()
    n_dev = mesh.devices.size
    x = np.asarray(samples, np.float32)
    if x.ndim == 1:
        x = x[:, None]
    n, d = x.shape
    g = np.asarray(grid_points, np.float32).reshape(-1, d)
    xp, _ = pad_to_multiple(x, n_dev)
    w = np.zeros(xp.shape[0], np.float32)
    w[:n] = 1.0
    sharding = frame_sharding(mesh)
    x_d = jax.device_put(xp, sharding)
    w_d = jax.device_put(w, sharding)
    g_d = jax.device_put(g, NamedSharding(mesh, P()))
    inv_two_bw2 = jnp.float32(1.0 / (2.0 * bandwidth * bandwidth))

    fn = _get_sharded_kde(mesh, xp.shape, g.shape)
    lse = fn(x_d, w_d, g_d, inv_two_bw2)
    return np.asarray(lse) - np.log(n)
