"""StreamingHTICA (two-pass blocked) vs the in-memory HTICA recipe."""

import numpy as np
import pytest

from deep_cartograph_tpu.cv.htica_stream import StreamingHTICA
from deep_cartograph_tpu.cv.tica_math import (
    create_timelagged_dataset,
    tica,
)


def _reference_htica(data, n_sub, sub_out, cv_dim, lag, reg):
    """The in-memory recipe (cv/linear.py HTICACalculator.compute_cv)."""
    f = data.shape[1]
    sub_d = f // n_sub
    x_t, x_lag = create_timelagged_dataset(data, lag)
    level1, proj_t, proj_lag = [], [], []
    for s in range(n_sub):
        cols = slice(s * sub_d, (s + 1) * sub_d)
        _, evecs = tica(x_t[:, cols], x_lag[:, cols], sub_out, reg=reg)
        level1.append(evecs)
        proj_t.append(x_t[:, cols] @ evecs)
        proj_lag.append(x_lag[:, cols] @ evecs)
    z_t = np.concatenate(proj_t, 1)
    z_lag = np.concatenate(proj_lag, 1)
    evals, level2 = tica(z_t, z_lag, cv_dim, reg=reg)
    blockdiag = np.zeros((f, n_sub * sub_out), np.float32)
    for s, b in enumerate(level1):
        blockdiag[s * sub_d : (s + 1) * sub_d, s * sub_out : (s + 1) * sub_out] = b
    return evals, blockdiag @ level2


@pytest.fixture(scope="module")
def slow_fast_data():
    rng = np.random.default_rng(3)
    n, f = 3000, 24
    slow = np.zeros(n)
    for i in range(1, n):
        slow[i] = 0.995 * slow[i - 1] + 0.1 * rng.standard_normal()
    mix = rng.standard_normal((1, f)).astype(np.float32)
    data = (slow[:, None] * mix + 0.5 * rng.standard_normal((n, f))).astype(
        np.float32
    )
    return data


@pytest.mark.parametrize("block", [257, 1000, 3000])
def test_streaming_matches_in_memory(slow_fast_data, block):
    data = slow_fast_data
    n_sub, sub_out, cv_dim, lag, reg = 4, 2, 2, 5, 1e-6

    evals_ref, w_ref = _reference_htica(data, n_sub, sub_out, cv_dim, lag, reg)

    sh = StreamingHTICA(
        n_features=data.shape[1],
        num_subspaces=n_sub,
        subspaces_dimension=sub_out,
        cv_dimension=cv_dim,
        lag_time=lag,
        reg=reg,
    )

    def block_iter():
        for start in range(0, data.shape[0], block):
            yield data[start : start + block]

    sh.fit(block_iter)

    np.testing.assert_allclose(sh.eigenvalues_, evals_ref[:cv_dim], atol=2e-3)
    # weights agree up to per-column sign
    w = np.asarray(sh.weights)
    for c in range(cv_dim):
        agree = np.abs(w[:, c] - w_ref[:, c]).max()
        flipped = np.abs(w[:, c] + w_ref[:, c]).max()
        assert min(agree, flipped) < 5e-3, (c, agree, flipped)
    # projections correlate perfectly with the reference projection
    proj_s = sh.project_blocks(block_iter())
    proj_r = data @ w_ref
    for c in range(cv_dim):
        corr = abs(np.corrcoef(proj_s[:, c], proj_r[:, c])[0, 1])
        assert corr > 0.999


def test_streaming_survives_large_feature_means(slow_fast_data):
    """Features with mean >> std (real distances are O(1-10 nm) with tiny
    fluctuations) must not NaN the f32 moment accumulation — regression for
    the shift-centering fix (raw second moments cancel catastrophically)."""
    data = slow_fast_data + np.float32(250.0)  # huge offset, tiny variance
    sh = StreamingHTICA(24, 4, 2, 2, lag_time=5)
    sh.fit(lambda: (data[i : i + 500] for i in range(0, len(data), 500)))
    assert np.isfinite(sh.eigenvalues_).all()
    assert np.isfinite(sh.weights).all()
    # and still matches the in-memory recipe on the SHIFTED data
    evals_ref, _ = _reference_htica(data, 4, 2, 2, 5, 1e-6)
    np.testing.assert_allclose(sh.eigenvalues_, evals_ref[:2], atol=5e-3)


def test_streaming_handles_lag_across_block_seams(slow_fast_data):
    """Pair count must equal n - lag regardless of blocking (the carry keeps
    cross-boundary pairs)."""
    data = slow_fast_data[:503]
    sh = StreamingHTICA(24, 4, 2, 2, lag_time=7)
    pair_counts = sum(
        int(xt.shape[0])
        for xt, _ in sh._stream_pairs(
            data[i : i + 50] for i in range(0, 503, 50)
        )
    )
    assert pair_counts == 503 - 7


def test_rejects_uneven_subspaces():
    with pytest.raises(ValueError):
        StreamingHTICA(25, 4, 2, 2, lag_time=1)


def test_subspace_sharded_over_mesh_matches(slow_fast_data):
    """mesh= shards the subspace axis over the 8 virtual devices; results
    must match the single-device streaming run."""
    from deep_cartograph_tpu.parallel.mesh import get_mesh

    data = slow_fast_data  # 24 features -> 8 subspaces of 3
    mesh = get_mesh()
    args = dict(
        n_features=24, num_subspaces=8, subspaces_dimension=2,
        cv_dimension=2, lag_time=5,
    )
    make_iter = lambda: (data[i : i + 500] for i in range(0, len(data), 500))

    single = StreamingHTICA(**args)
    single.fit(make_iter)
    sharded = StreamingHTICA(**args, mesh=mesh)
    sharded.fit(make_iter)

    np.testing.assert_allclose(
        sharded.eigenvalues_, single.eigenvalues_, atol=1e-4
    )
    np.testing.assert_allclose(sharded.weights, single.weights, atol=1e-3)

    with pytest.raises(ValueError):  # 6 subspaces don't divide over 8 devices
        StreamingHTICA(24, 6, 2, 2, lag_time=5, mesh=mesh)


def test_fit_fused_matches_fit(rng):
    """The single-dispatch fused path reproduces fit() exactly: same
    lag-carry pairing, same first-block shift, same weights."""
    import jax
    import jax.numpy as jnp

    from deep_cartograph_tpu.cv.htica_stream import StreamingHTICA

    n_frames, n_feat, block = 600, 24, 100
    data = rng.standard_normal((n_frames, n_feat)).astype(np.float32)
    # smooth signal so TICA has structure
    data = np.cumsum(data, axis=0) / 10 + data
    data_d = jnp.asarray(data)

    def make(**kw):
        return StreamingHTICA(
            n_features=n_feat, num_subspaces=4, subspaces_dimension=3,
            cv_dimension=2, lag_time=5, reg=1e-6, **kw,
        )

    a = make()
    a.fit(lambda: (
        data_d[s : s + block] for s in range(0, n_frames, block)
    ))
    b = make()
    b.fit_fused(lambda start: jax.lax.dynamic_slice_in_dim(
        data_d, start, block, 0
    ), n_frames, block)

    np.testing.assert_allclose(b.eigenvalues_, a.eigenvalues_, atol=1e-4)
    # eigenvector signs are a convention; compare |projection|
    pa = np.abs(data @ a.weights)
    pb = np.abs(data @ b.weights)
    np.testing.assert_allclose(pb, pa, atol=1e-3)


@pytest.mark.parametrize("k", [1, 2, 3, 6])
def test_fit_chunked_matches_fit(rng, k):
    """The K-blocks-per-dispatch path reproduces fit() exactly for every
    chunking, including the K=1 (pure eager) and K=n_blocks (whole pass
    in one dispatch) extremes: same first-block shift, same lag-frame
    seam pairs across block boundaries, same weights."""
    import jax
    import jax.numpy as jnp

    from deep_cartograph_tpu.cv.htica_stream import StreamingHTICA

    n_frames, n_feat, block = 600, 24, 100
    data = rng.standard_normal((n_frames, n_feat)).astype(np.float32)
    data = np.cumsum(data, axis=0) / 10 + data
    data_d = jnp.asarray(data)

    def make():
        return StreamingHTICA(
            n_features=n_feat, num_subspaces=4, subspaces_dimension=3,
            cv_dimension=2, lag_time=5, reg=1e-6,
        )

    a = make()
    a.fit(lambda: (
        data_d[s : s + block] for s in range(0, n_frames, block)
    ))
    b = make()
    b.fit_chunked(
        lambda start: jax.lax.dynamic_slice_in_dim(data_d, start, block, 0),
        n_frames, block, blocks_per_dispatch=k,
    )

    np.testing.assert_allclose(b.eigenvalues_, a.eigenvalues_, atol=1e-4)
    pa = np.abs(data @ a.weights)
    pb = np.abs(data @ b.weights)
    np.testing.assert_allclose(pb, pa, atol=1e-3)


def test_fit_chunked_block_args_matches_closure(rng):
    """Passing the data buffer via block_args (traced jit arguments —
    the production shape, which keeps device buffers out of the lowered
    module) produces exactly the closure-capture result."""
    import jax
    import jax.numpy as jnp

    from deep_cartograph_tpu.cv.htica_stream import StreamingHTICA

    n_frames, n_feat, block = 600, 24, 100
    data = rng.standard_normal((n_frames, n_feat)).astype(np.float32)
    data = np.cumsum(data, axis=0) / 10 + data
    data_d = jnp.asarray(data)

    def make():
        return StreamingHTICA(
            n_features=n_feat, num_subspaces=4, subspaces_dimension=3,
            cv_dimension=2, lag_time=5, reg=1e-6,
        )

    a = make()
    a.fit_chunked(
        lambda start: jax.lax.dynamic_slice_in_dim(data_d, start, block, 0),
        n_frames, block, blocks_per_dispatch=3,
    )
    b = make()
    b.fit_chunked(
        lambda start, buf: jax.lax.dynamic_slice_in_dim(buf, start, block, 0),
        n_frames, block, blocks_per_dispatch=3, block_args=(data_d,),
    )
    np.testing.assert_allclose(b.eigenvalues_, a.eigenvalues_, atol=1e-5)
    np.testing.assert_allclose(
        np.abs(data @ b.weights), np.abs(data @ a.weights), atol=1e-4
    )


def test_fit_chunked_rejects_uneven_chunking(rng):
    import jax

    from deep_cartograph_tpu.cv.htica_stream import StreamingHTICA

    sh = StreamingHTICA(
        n_features=24, num_subspaces=4, subspaces_dimension=3,
        cv_dimension=2, lag_time=5,
    )
    import jax.numpy as jnp
    data = jnp.zeros((600, 24), jnp.float32)
    with pytest.raises(ValueError):  # 6 blocks don't chunk by 4
        sh.fit_chunked(
            lambda s: jax.lax.dynamic_slice_in_dim(data, s, 100, 0),
            600, 100, blocks_per_dispatch=4,
        )


def test_host_scipy_solver_matches_device_path():
    """The host top-k LAPACK path (engaged above _EIGH_HOST_DIM_THRESHOLD)
    must agree with the jitted whitening+eigh device path: same descending
    eigenvalues and the same eigenvectors up to column sign, normalized in
    the regularized-C0 metric."""
    import jax.numpy as jnp

    from deep_cartograph_tpu.cv.htica_stream import (
        _EIGH_HOST_DIM_THRESHOLD,
        _batched_tica,
        _run_batched_tica,
    )

    rng = np.random.default_rng(11)
    n_sub, d, k, reg = 3, _EIGH_HOST_DIM_THRESHOLD + 16, 2, 1e-6
    a = rng.standard_normal((n_sub, d, d)).astype(np.float32)
    c0 = np.einsum("sij,skj->sik", a, a) / d + np.eye(d, dtype=np.float32)
    sym = rng.standard_normal((n_sub, d, d)).astype(np.float32)
    ctau = 0.05 * (sym + sym.transpose(0, 2, 1))

    w_host, v_host = _run_batched_tica(jnp.asarray(c0), jnp.asarray(ctau),
                                       reg, k)
    w_dev, v_dev = _batched_tica(jnp.asarray(c0), jnp.asarray(ctau), reg, k)
    w_host, v_host = np.asarray(w_host), np.asarray(v_host)
    w_dev, v_dev = np.asarray(w_dev), np.asarray(v_dev)

    assert w_host.shape == (n_sub, k) and v_host.shape == (n_sub, d, k)
    assert (np.diff(w_host, axis=1) <= 1e-6).all()  # descending
    np.testing.assert_allclose(w_host, w_dev, atol=2e-3)
    for s in range(n_sub):
        for c in range(k):
            agree = np.abs(v_host[s, :, c] - v_dev[s, :, c]).max()
            flip = np.abs(v_host[s, :, c] + v_dev[s, :, c]).max()
            assert min(agree, flip) < 5e-2, (s, c, agree, flip)
    # metric normalization: v^T (C0 + reg I) v == 1
    for s in range(n_sub):
        b_reg = c0[s] + reg * np.eye(d, dtype=np.float32)
        norms = np.einsum("dk,de,ek->k", v_host[s], b_reg, v_host[s])
        np.testing.assert_allclose(norms, 1.0, atol=1e-3)


def _tica_like_covs(rng, n_sub, d, n=3000, slow=6):
    """AR(1)-style covariances with a handful of slow modes near 1 over a
    noise bulk — the spectrum shape real TICA level-1 problems have."""
    c0 = np.empty((n_sub, d, d), np.float32)
    ctau = np.empty_like(c0)
    for s in range(n_sub):
        x = rng.standard_normal((n, d)).astype(np.float32)
        for k in range(slow):
            v = np.cumsum(rng.standard_normal(n)).astype(np.float32)
            v -= v.mean()
            v /= v.std() + 1e-9
            x[:, k] = 0.9 * v + 0.1 * x[:, k]
        a = x[:-1] - x[:-1].mean(0)
        b = x[1:] - x[:-1].mean(0)
        c0[s] = a.T @ a / len(a)
        ctau[s] = (a.T @ b + b.T @ a) / (2 * len(a))
    return c0, ctau


def test_device_krylov_solver_matches_lapack(monkeypatch):
    """The device block-Krylov top-k solver (the default above
    _EIGH_HOST_DIM_THRESHOLD when few pairs are wanted — it pulls ~2 MB of
    projected matrices instead of the packed covariance triangles) must
    match the LAPACK sygvx subset path: eigenvalues to the f32 floor,
    eigenvectors up to sign, B-metric normalized."""
    import jax.numpy as jnp

    from deep_cartograph_tpu.cv.htica_stream import (
        _device_krylov_tica,
        _scipy_batched_tica_packed,
        _run_batched_tica,
    )

    rng = np.random.default_rng(7)
    n_sub, d, k, reg = 3, 320, 4, 1e-6
    c0, ctau = _tica_like_covs(rng, n_sub, d)

    w_k, v_k = _device_krylov_tica(jnp.asarray(c0), jnp.asarray(ctau),
                                   reg, k)
    rows, cols = np.tril_indices(d)
    packed = np.stack(
        [c0[:, rows, cols], ctau[:, rows, cols]], axis=1
    )
    w_l, v_l = _scipy_batched_tica_packed(packed, d, reg, k)

    np.testing.assert_allclose(w_k, w_l, atol=1e-4)
    for s in range(n_sub):
        for c in range(k):
            agree = np.abs(v_k[s, :, c] - v_l[s, :, c]).max()
            flip = np.abs(v_k[s, :, c] + v_l[s, :, c]).max()
            assert min(agree, flip) < 5e-3, (s, c, agree, flip)
        b_reg = c0[s] + reg * np.eye(d, dtype=np.float32)
        norms = np.einsum("dk,de,ek->k", v_k[s], b_reg, v_k[s])
        np.testing.assert_allclose(norms, 1.0, atol=1e-3)

    # the auto gate routes to the Krylov path for small k / large d and
    # honors the DC_HTICA_SOLVER override
    monkeypatch.setenv("DC_HTICA_SOLVER", "host")
    w_h, _ = _run_batched_tica(jnp.asarray(c0), jnp.asarray(ctau), reg, k)
    monkeypatch.setenv("DC_HTICA_SOLVER", "device")
    w_d, _ = _run_batched_tica(jnp.asarray(c0), jnp.asarray(ctau), reg, k)
    np.testing.assert_allclose(w_h, w_d, atol=1e-4)


def test_device_krylov_auto_gate_falls_back_for_wide_dim(monkeypatch):
    """auto routes to the host LAPACK path when the wanted pair count is a
    large fraction of the subspace (the Krylov projection degenerates
    toward a full solve there)."""
    import jax.numpy as jnp

    from deep_cartograph_tpu.cv import htica_stream as hs

    rng = np.random.default_rng(8)
    n_sub, d, reg = 2, 280, 1e-6
    c0, ctau = _tica_like_covs(rng, n_sub, d)
    calls = {"krylov": 0}
    orig = hs._device_krylov_tica

    def spy(*a, **kw):
        calls["krylov"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(hs, "_device_krylov_tica", spy)
    monkeypatch.setenv("DC_HTICA_SOLVER", "auto")
    hs._run_batched_tica(jnp.asarray(c0), jnp.asarray(ctau), reg, 100)
    assert calls["krylov"] == 0  # 8 * 100 > 280 -> host
    hs._run_batched_tica(jnp.asarray(c0), jnp.asarray(ctau), reg, 4)
    assert calls["krylov"] == 1


def test_device_krylov_solver_accepts_sharded_covariances():
    """The Krylov projection must execute on covariances sharded along the
    subspace axis (the multi-chip level-1 layout: every batched op in the
    projection partitions along S with no cross-device communication)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from deep_cartograph_tpu.cv import htica_stream as hs
    from deep_cartograph_tpu.parallel.mesh import get_mesh

    rng = np.random.default_rng(9)
    n_sub, d, dim, reg = 8, 280, 3, 1e-6
    c0, ctau = _tica_like_covs(rng, n_sub, d, n=1500)
    mesh = get_mesh()
    sh = NamedSharding(mesh, P(mesh.axis_names[0]))
    c0_s = jax.device_put(jnp.asarray(c0), sh)
    ctau_s = jax.device_put(jnp.asarray(ctau), sh)

    w_s, v_s = hs._device_krylov_tica(c0_s, ctau_s, reg, dim)
    w_r, v_r = hs._device_krylov_tica(jnp.asarray(c0), jnp.asarray(ctau),
                                      reg, dim)
    np.testing.assert_allclose(w_s, w_r, atol=1e-5)
    for s in range(n_sub):
        for c in range(dim):
            agree = np.abs(v_s[s, :, c] - v_r[s, :, c]).max()
            flip = np.abs(v_s[s, :, c] + v_r[s, :, c]).max()
            assert min(agree, flip) < 1e-3, (s, c, agree, flip)
