"""Vectorized feature statistics on device.

The reference computes these one feature at a time with per-feature file
re-reads (deep_cartograph/modules/statistics/statistics.py:382-635 +
modules/features/filter.py:213-256). Here every descriptor is computed for
ALL features in a single pass over one (frames, features) device array.
"""

from __future__ import annotations

import contextlib
from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _bin_indices(features: jnp.ndarray, num_bins: int) -> jnp.ndarray:
    fmin = jnp.min(features, axis=0)
    fmax = jnp.max(features, axis=0)
    span = jnp.where(fmax > fmin, fmax - fmin, 1.0)
    scaled = (features - fmin) / span * num_bins
    return jnp.clip(scaled.astype(jnp.int32), 0, num_bins - 1)


def _entropy_from_counts(counts: jnp.ndarray, n: int) -> jnp.ndarray:
    p = counts / n
    logp = jnp.where(p > 0, jnp.log2(jnp.where(p > 0, p, 1.0)), 0.0)
    return -jnp.sum(p * logp, axis=1)


@partial(jax.jit, static_argnames=("num_bins",))
def _entropy_scatter(features: jnp.ndarray, num_bins: int = 100) -> jnp.ndarray:
    """Histogram via one flattened scatter-add (fast on CPU backends)."""
    n, n_feat = features.shape
    idx = _bin_indices(features, num_bins)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n_feat), 1)
    flat = (col * num_bins + idx).reshape(-1)
    counts = jnp.zeros(n_feat * num_bins, features.dtype).at[flat].add(1.0)
    return _entropy_from_counts(counts.reshape(n_feat, num_bins), n)


@partial(jax.jit, static_argnames=("num_bins",))
def _entropy_scan(features: jnp.ndarray, num_bins: int = 100) -> jnp.ndarray:
    """Histogram via a scan over bins: each step is one fused compare+reduce
    pass over narrow bin indices — HBM-bound and scatter-free, ~50x faster
    than the scatter form on TPU (scatters serialize on the VPU). int16
    indices keep the narrow-dtype bandwidth win while supporting any
    practical bin count (int8 silently wraps past 127 bins)."""
    n, n_feat = features.shape
    dtype = jnp.int8 if num_bins <= 127 else jnp.int16
    idx = _bin_indices(features, num_bins).astype(dtype)

    def body(_, b):
        return None, jnp.sum((idx == b).astype(jnp.float32), axis=0)

    _, counts = jax.lax.scan(
        body, None, jnp.arange(num_bins, dtype=dtype)
    )  # (num_bins, n_feat)
    return _entropy_from_counts(counts.T, n)


def _entropy_all(features: jnp.ndarray, num_bins: int = 100) -> jnp.ndarray:
    """Shannon entropy (base 2) of each feature's 100-bin histogram.

    Matches the reference recipe (statistics.py:514-566): density histogram,
    p = density * bin_width, H = -sum p log2 p. Backend-dispatched: scatter
    on CPU, bin-scan on accelerators.
    """
    platform = None
    if isinstance(features, jax.Array) and not isinstance(
        features, jax.core.Tracer
    ):
        try:
            platform = next(iter(features.devices())).platform
        except Exception:
            platform = None
    if platform is None:
        d = jax.config.jax_default_device
        platform = d.platform if d is not None else jax.default_backend()
    if platform == "cpu":
        return _entropy_scatter(features, num_bins)
    return _entropy_scan(features, num_bins)


@jax.jit
def _std_all(features: jnp.ndarray) -> jnp.ndarray:
    return jnp.std(features, axis=0)


@jax.jit
def _minmax_all(features: jnp.ndarray):
    return jnp.min(features, axis=0), jnp.max(features, axis=0)


# Feature-block budget: cap per-dispatch elements so 100k-frame x 50k-feature
# matrices stream through HBM in blocks instead of landing whole.
_BLOCK_ELEMENT_BUDGET = 200_000_000


def _feature_blocks(features: np.ndarray):
    n, f = features.shape
    block = max(1, min(f, _BLOCK_ELEMENT_BUDGET // max(n, 1)))
    for start in range(0, f, block):
        yield features[:, start : start + block]


def _put_feature_sharded(block: np.ndarray):
    """Multi-device backends: place the block with its FEATURE axis sharded
    over a 1-D mesh. Per-feature reductions (entropy histogram, std) then
    run fully local to each device — every chip of a pod slice works on its
    feature slice with zero collectives. Returns (device_array, n_features)
    where the feature axis may be padded to the mesh size."""
    import jax

    from deep_cartograph_tpu.parallel.mesh import (
        FRAME_AXIS,
        get_mesh,
        pad_to_multiple,
    )
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    mesh = get_mesh()
    padded, f = pad_to_multiple(
        np.asarray(block, np.float32), int(mesh.devices.size), axis=1
    )
    return (
        jax.device_put(padded, NamedSharding(mesh, P(None, FRAME_AXIS))),
        f,
    )


def _placed_blocks(features: np.ndarray, allow_shard: bool = True):
    """(device_block, n_features) pairs: feature-sharded over the mesh for
    large multi-device workloads, plain placement otherwise. allow_shard
    False when the caller's transfer-aware routing already decided the
    data must stay on the host — an explicit device_put would silently
    override that decision."""
    import jax

    from deep_cartograph_tpu.utils.device import SMALL_WORK_ELEMENTS

    if isinstance(features, jax.Array):
        # already on device: block along features without leaving it
        for block in _feature_blocks(features):
            yield block, block.shape[1]
        return
    arr = np.asarray(features)
    shard = (
        allow_shard
        and arr.size >= SMALL_WORK_ELEMENTS
        and len(jax.devices()) > 1
    )
    for block in _feature_blocks(arr):
        if shard:
            yield _put_feature_sharded(block)
        else:
            yield jnp.asarray(block), block.shape[1]


def shannon_entropy(features: np.ndarray, num_bins: int = 100) -> np.ndarray:
    """Per-feature entropy, rounded to 3 decimals like the reference.
    Feature-blocked for matrices larger than the per-dispatch budget.
    Routing is TRANSFER-AWARE for host-resident input: this is an O(1)
    work-per-element op, so the device only wins when uploading the matrix
    beats just computing on the host (never through a slow tunnel, usually
    on PCIe); device-resident inputs stay put."""
    from deep_cartograph_tpu.utils.device import maybe_cpu_for_host_data

    arr = features if _is_device_array(features) else np.asarray(features)
    if _is_device_array(features):
        ctx = contextlib.nullcontext()
        routed_cpu = False
    else:
        ctx = maybe_cpu_for_host_data(arr.size, arr.nbytes, host_rate=1e8)
        routed_cpu = not isinstance(ctx, contextlib.nullcontext)
    with ctx:
        parts = [
            np.asarray(_entropy_all(block, num_bins))[:f]
            for block, f in _placed_blocks(arr, allow_shard=not routed_cpu)
        ]
    return np.round(np.concatenate(parts), 3)


def standard_deviation(features: np.ndarray) -> np.ndarray:
    """Per-feature std, rounded to 3 decimals like the reference.
    Transfer-aware routing, like shannon_entropy."""
    from deep_cartograph_tpu.utils.device import maybe_cpu_for_host_data

    arr = features if _is_device_array(features) else np.asarray(features)
    if _is_device_array(features):
        ctx = contextlib.nullcontext()
        routed_cpu = False
    else:
        ctx = maybe_cpu_for_host_data(arr.size, arr.nbytes, host_rate=4e8)
        routed_cpu = not isinstance(ctx, contextlib.nullcontext)
    with ctx:
        parts = [
            np.asarray(_std_all(block))[:f]
            for block, f in _placed_blocks(arr, allow_shard=not routed_cpu)
        ]
    return np.round(np.concatenate(parts), 3)


def _is_device_array(x) -> bool:
    import jax

    return isinstance(x, jax.Array)


def dip_pvalues(features: np.ndarray) -> np.ndarray:
    """Hartigan dip-test p-value per feature.

    The dip statistic is computed by the OpenMP-parallel native batch kernel
    when available (deep_cartograph_tpu/native/diptest.cpp); p-values come
    from the shared Monte Carlo null table. Falls back to the pure-Python
    implementation otherwise.
    """
    from deep_cartograph_tpu.stats.dip import dip_pvalue, pvalue_from_dip

    dips = dip_statistics_batch(features)
    if dips is not None:
        n = features.shape[0]
        return np.asarray([pvalue_from_dip(d, n) for d in dips])
    return np.asarray(
        [dip_pvalue(features[:, j])[1] for j in range(features.shape[1])]
    )


def dip_statistics_batch(features: np.ndarray) -> Optional[np.ndarray]:
    """Native batch dip statistics (None if the extension is unavailable)."""
    import ctypes

    from deep_cartograph_tpu.native.build import load_native

    lib = load_native()
    if lib is None or not hasattr(lib, "dip_statistics_batch"):
        return None
    n_samples, n_features = features.shape
    # native kernel expects (n_features, n_samples) row-major
    cols = np.ascontiguousarray(features.T, dtype=np.float64)
    out = np.empty(n_features, np.float64)
    lib.dip_statistics_batch(
        cols.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n_features,
        n_samples,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return out


def min_value_filter(features: np.ndarray, threshold: float) -> List[bool]:
    """True where a feature's minimum is <= threshold
    (cf. reference statistics.py:487-511)."""
    mins = np.asarray(jnp.min(jnp.asarray(features), axis=0))
    return [bool(v <= threshold) for v in mins]


def difference_filter(
    features: np.ndarray, feature_names: List[str]
) -> List[bool]:
    """Per-feature-type variation screen across waypoint samples
    (cf. reference statistics.py:382-485).

    sin/cos pairs: max angular spread >= pi/8; tor: range >= pi/8;
    coord triplets: max pairwise 3-D displacement >= 0.2 nm; other: range
    >= 0.2 nm.
    """
    angle_threshold = np.pi / 8
    distance_threshold = 0.2

    if features.size == 0:
        return []

    name_to_col = {n: j for j, n in enumerate(feature_names)}
    result: Dict[str, bool] = {}
    atoms_touched = set()

    for name in feature_names:
        parts = name.split("-")
        if len(parts) <= 1:
            continue
        ftype = parts[0]
        col = features[:, name_to_col[name]]

        if ftype == "sin":
            cos_name = name.replace("sin", "cos", 1)
            if cos_name in name_to_col:
                angles = np.arctan2(col, features[:, name_to_col[cos_name]]) + np.pi
                delta = np.abs(np.max(angles) - np.min(angles))
            else:
                delta = 10.0  # orphan sine: keep (cf. statistics.py:429-431)
            passed = bool(delta >= angle_threshold)
            result[name] = passed
            result[cos_name] = passed
        elif ftype == "cos":
            continue  # handled with its sine twin
        elif ftype == "tor":
            delta = np.max(col) - np.min(col)
            result[name] = bool(delta >= angle_threshold)
        elif ftype == "coord":
            atom = parts[1].split(".")[0]
            if atom in atoms_touched:
                continue
            atoms_touched.add(atom)
            xyz = []
            axis_names = [f"coord-{atom}.{ax}" for ax in ("x", "y", "z")]
            for an in axis_names:
                xyz.append(
                    features[:, name_to_col[an]]
                    if an in name_to_col
                    else np.zeros(features.shape[0])
                )
            pts = np.stack(xyz, axis=1)
            diffs = pts[:, None, :] - pts[None, :, :]
            delta = float(np.sqrt((diffs**2).sum(-1)).max())
            passed = bool(delta >= distance_threshold)
            for an in axis_names:
                if an in name_to_col:
                    result[an] = passed
        else:
            delta = np.abs(np.max(col) - np.min(col))
            result[name] = bool(delta >= distance_threshold)

    return [result.get(n, True) for n in feature_names]


def feature_statistics(features: np.ndarray) -> Dict[str, np.ndarray]:
    """mean/std/min/max for every feature in one device pass
    (used by CV normalization; cf. reference cv_calculator.py:294-298)."""
    from deep_cartograph_tpu.utils.device import maybe_cpu

    with maybe_cpu(np.asarray(features).size):
        arr = jnp.asarray(features)
        mean = jnp.mean(arr, axis=0)
        std = jnp.std(arr, axis=0)
        fmin, fmax = _minmax_all(arr)
    return {
        "mean": np.asarray(mean, np.float64),
        "std": np.asarray(std, np.float64),
        "min": np.asarray(fmin, np.float64),
        "max": np.asarray(fmax, np.float64),
    }
