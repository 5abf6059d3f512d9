"""Sharded compute paths on the virtual 8-device CPU mesh."""

import jax
import numpy as np

from deep_cartograph_tpu.cv.tica_math import (
    create_timelagged_dataset,
    generalized_eigh,
    tica,
    timelagged_covariances,
)
from deep_cartograph_tpu.parallel.mesh import get_mesh
from deep_cartograph_tpu.parallel.sharding import (
    lag_pairs_with_halo,
    sharded_covariances,
    sharded_feature_matrix_stats,
)


def test_virtual_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_covariances_match_single_device(rng):
    x = rng.standard_normal((203, 6)).astype(np.float32)
    x_t, x_lag = create_timelagged_dataset(x, lag_time=2)
    c0_ref, ctau_ref, _ = timelagged_covariances(x_t, x_lag)
    mesh = get_mesh()
    c0, ctau = sharded_covariances(x_t, x_lag, mesh)
    np.testing.assert_allclose(c0, np.asarray(c0_ref), atol=1e-5)
    np.testing.assert_allclose(ctau, np.asarray(ctau_ref), atol=1e-5)


def test_sharded_stats_match(rng):
    x = rng.standard_normal((101, 5)).astype(np.float32) * 3 + 1
    stats = sharded_feature_matrix_stats(x)
    np.testing.assert_allclose(stats["mean"], x.mean(0), atol=1e-5)
    np.testing.assert_allclose(stats["std"], x.std(0), atol=1e-5)
    np.testing.assert_allclose(stats["min"], x.min(0), atol=1e-6)
    np.testing.assert_allclose(stats["max"], x.max(0), atol=1e-6)


def test_lag_halo_pairs(rng):
    mesh = get_mesh()
    n_dev = mesh.devices.size
    n = n_dev * 5
    lag = 2
    x = rng.standard_normal((n, 3)).astype(np.float32)
    x_t, x_lag, valid = (np.asarray(a) for a in lag_pairs_with_halo(
        jax.device_put(x), lag, mesh
    ))
    # valid rows must reproduce the serial pairing
    mask = valid.astype(bool)
    assert mask.sum() == n - lag
    np.testing.assert_allclose(x_t[mask], x[:-lag], atol=0)
    np.testing.assert_allclose(x_lag[mask], x[lag:], atol=1e-6)


def test_generalized_eigh_correctness(rng):
    a = rng.standard_normal((5, 5))
    a = (a + a.T) / 2
    b_half = rng.standard_normal((5, 5))
    b = b_half @ b_half.T + 5 * np.eye(5)
    w, v = generalized_eigh(np.asarray(a, np.float32), np.asarray(b, np.float32), reg=0.0)
    w, v = np.asarray(w), np.asarray(v)
    # residual check A v = w B v
    for i in range(5):
        np.testing.assert_allclose(
            a @ v[:, i], w[i] * (b @ v[:, i]), atol=5e-4
        )
    # descending order and B-orthonormality
    assert np.all(np.diff(w) <= 1e-6)
    np.testing.assert_allclose(v.T @ b @ v, np.eye(5), atol=5e-4)


def test_tica_recovers_slow_mode(rng):
    # Construct signals: dim0 slow (heavily autocorrelated), dim1 fast noise
    n = 4000
    slow = np.zeros(n)
    for i in range(1, n):
        slow[i] = 0.99 * slow[i - 1] + 0.1 * rng.standard_normal()
    fast = rng.standard_normal(n)
    data = np.stack([slow, fast], axis=1).astype(np.float32)
    # mix the channels
    mix = np.array([[1.0, 0.5], [0.2, 1.0]], np.float32)
    mixed = data @ mix.T
    x_t, x_lag = create_timelagged_dataset(mixed, lag_time=5)
    evals, evecs = tica(x_t, x_lag, out_features=2)
    assert evals[0] > 0.8  # slow mode autocorrelation
    assert evals[0] > evals[1] + 0.2
    # The leading eigenvector should recover the slow direction:
    # projection of mixed data on evec0 ~ slow signal (up to scale/sign)
    proj = (mixed - mixed.mean(0)) @ evecs[:, 0]
    corr = np.corrcoef(proj, slow)[0, 1]
    assert abs(corr) > 0.95


def test_sharded_featurization_matches_single(ca_system):
    from deep_cartograph_tpu.geom.engine import Featurizer
    from deep_cartograph_tpu.io.topology import Topology

    top = Topology.from_pdb(ca_system.pdb_path)
    labels = ["dist-@CA_1-@CA_5", "sin-@CA_1-@CA_2-@CA_3-@CA_4",
              "cos-@CA_1-@CA_2-@CA_3-@CA_4"]
    featurizer = Featurizer(top, labels)
    single = featurizer(ca_system.coords)
    sharded, n = featurizer.featurize_frames_sharded(
        ca_system.coords, get_mesh()
    )
    np.testing.assert_allclose(np.asarray(sharded)[:n], single, atol=1e-5)


def test_graft_entry_contract():
    """entry() compiles and dryrun_multichip runs on the virtual mesh."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "graft_entry", "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out)).all()
    mod.dryrun_multichip(8)


def test_dryrun_multichip_self_provisions_devices():
    """Driver contract: dryrun_multichip(8) must pass from a fresh process
    that sees only ONE device (no --xla_force_host_platform_device_count
    pre-set). Reproduces the round-1 MULTICHIP failure mode."""
    import os
    import subprocess
    import sys

    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "_DC_TPU_DRYRUN_CHILD", "PALLAS_AXON_POOL_IPS")
    }
    env["JAX_PLATFORMS"] = "cpu"  # parent: 1 CPU device, like the driver
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = (
        "import sys; sys.path.insert(0, {0!r}); "
        "import jax; assert len(jax.devices()) == 1, jax.devices(); "
        "import __graft_entry__; "
        "__graft_entry__.dryrun_multichip(8)".format(repo)
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd=repo,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip OK: 8 devices" in proc.stdout


def test_lag_pairs_respect_trajectory_seams():
    """Time-lagged pairs must not cross trajectory boundaries (documented
    deviation from the reference, which pairs across concatenated files)."""
    from deep_cartograph_tpu.cv.tica_math import (
        create_timelagged_dataset_multi,
    )

    block_a = np.zeros((10, 2), np.float32)
    block_b = np.full((10, 2), 100.0, np.float32)
    x_t, x_lag = create_timelagged_dataset_multi([block_a, block_b], lag_time=3)
    # 7 pairs per block; no pair mixes 0-block and 100-block values
    assert x_t.shape == (14, 2)
    mixed = np.abs(x_lag - x_t) > 50
    assert not mixed.any()


def test_feature_sharded_covariance_ring(rng):
    """TP path: feature-axis ring covariance == single-device covariance."""
    from deep_cartograph_tpu.parallel.sharding import (
        feature_sharded_covariance_ring,
    )

    n, f = 500, 37  # not divisible by 8 -> exercises feature padding
    x = rng.standard_normal((n, f)).astype(np.float32)
    c_sharded, fp = feature_sharded_covariance_ring(x)
    c = np.asarray(c_sharded)[:f, :f]

    xc = x - x.mean(axis=0, keepdims=True)
    expected = xc.T @ xc / n
    np.testing.assert_allclose(c, expected, atol=1e-5)
    # padded rows/cols are zero
    assert np.abs(np.asarray(c_sharded)[f:, :]).max() == 0.0


def test_feature_sharded_timelagged_ring(rng):
    from deep_cartograph_tpu.cv.tica_math import timelagged_covariances
    from deep_cartograph_tpu.parallel.sharding import (
        feature_sharded_timelagged_ring,
    )

    n, f, lag = 400, 21, 5
    x = np.cumsum(rng.standard_normal((n + lag, f)).astype(np.float32), 0)
    xt, xl = x[:-lag], x[lag:]
    c0_s, ct_s, fp = feature_sharded_timelagged_ring(xt, xl)
    c0_ref, ct_ref, _ = timelagged_covariances(xt, xl)
    np.testing.assert_allclose(np.asarray(c0_s)[:f, :f], np.asarray(c0_ref),
                               atol=1e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ct_s)[:f, :f], np.asarray(ct_ref),
                               atol=1e-3, rtol=1e-4)


def test_sharded_kde_matches_dense(rng):
    from deep_cartograph_tpu.parallel.sharding import sharded_kde_logdensity

    samples = rng.standard_normal(203).astype(np.float32)  # odd -> padding
    grid = np.linspace(-3, 3, 50).astype(np.float32)
    bw = 0.3
    logp = sharded_kde_logdensity(samples, grid, bw)

    d2 = (grid[:, None] - samples[None, :]) ** 2
    logk = -d2 / (2 * bw * bw)
    from scipy.special import logsumexp
    expected = logsumexp(logk, axis=1) - np.log(len(samples))
    np.testing.assert_allclose(logp, expected, atol=1e-5)


def test_local_shard_partitions_work():
    from deep_cartograph_tpu.parallel.mesh import local_shard

    items = [f"traj_{i}.dcd" for i in range(7)]
    assert local_shard(items) == items  # single-process: everything
    parts = [local_shard(items, process_id=p, num_processes=3) for p in range(3)]
    assert sorted(sum(parts, [])) == sorted(items)
    assert all(len(p) >= 2 for p in parts)


def test_featurizer_auto_shards_over_multi_device_backend(ca_system):
    """With >1 default-backend devices (8 virtual CPUs here) the Featurizer
    routes chunks through ShardedChunkEvaluator automatically — the frame
    axis of each chunk spreads over the whole mesh (SURVEY §2.5) — with
    values identical to the single-device evaluator."""
    import jax
    import numpy as np

    from deep_cartograph_tpu.geom.engine import (
        Featurizer,
        ShardedChunkEvaluator,
    )
    from deep_cartograph_tpu.geom.kernels import PlanEvaluator
    from deep_cartograph_tpu.io.topology import Topology

    assert len(jax.devices()) > 1  # conftest provisions the virtual mesh

    top = Topology.from_file(ca_system.pdb_path)
    labels = ["dist-@CA_1-@CA_5", "sin-@CA_1-@CA_2-@CA_3-@CA_4"]
    featurizer = Featurizer(top, labels, device="default")

    ev = featurizer._get_evaluator(None)
    assert isinstance(ev, ShardedChunkEvaluator)
    assert ev.n_devices == len(jax.devices())

    coords = ca_system.coords[:30]  # 30 frames over 8 devices: uneven -> pad
    out_sharded = np.asarray(ev.eval_raw(coords))
    reference = PlanEvaluator(featurizer.plan)(coords)
    assert out_sharded.shape == reference.shape
    np.testing.assert_allclose(out_sharded, reference, atol=1e-6)

    # the device view really is sharded across the mesh: the shared plan
    # program partitions along the frame axis from the input sharding
    raw = ev.inner.eval_raw(
        jax.device_put(
            np.repeat(coords[:1], 8 * 4, axis=0), ev._sharding
        )
    )
    assert len(raw.sharding.device_set) == len(jax.devices())


def test_filter_stats_auto_shard_feature_axis(rng, monkeypatch):
    """Large stats workloads on multi-device backends shard the FEATURE axis
    (zero-collective per-feature reductions) and match the unsharded values."""
    import jax

    from deep_cartograph_tpu.stats import descriptors
    from deep_cartograph_tpu.stats.descriptors import (
        shannon_entropy,
        standard_deviation,
    )

    assert len(jax.devices()) > 1
    x = rng.standard_normal((400, 37)).astype(np.float32)  # 37 % 8 != 0

    ent_small = shannon_entropy(x)
    std_small = standard_deviation(x)

    placed = []
    orig = descriptors._put_feature_sharded

    def spy(block):
        out = orig(block)
        placed.append(out[0].sharding)
        return out

    monkeypatch.setattr(descriptors, "_put_feature_sharded", spy)
    # Force the sharded branch by dropping the size threshold
    monkeypatch.setattr(
        "deep_cartograph_tpu.utils.device.SMALL_WORK_ELEMENTS", 0
    )
    ent_sharded = shannon_entropy(x)
    std_sharded = standard_deviation(x)

    assert placed and all(
        len(s.device_set) == len(jax.devices()) for s in placed
    )
    np.testing.assert_allclose(ent_sharded, ent_small, atol=1e-6)
    np.testing.assert_allclose(std_sharded, std_small, atol=1e-6)


def test_compute_fes_multi_device_path_matches(rng):
    """Large-FES requests on multi-device backends route through the
    frame-sharded KDE and match the dense single-program estimate."""
    import jax

    from deep_cartograph_tpu.fes import kde as kde_mod

    assert len(jax.devices()) > 1
    data = np.concatenate(
        [
            rng.normal(-1.0, 0.2, 700),
            rng.normal(1.2, 0.3, 700),
        ]
    ).astype(np.float32)

    axes_small, fes_small, err_small = kde_mod.compute_fes(
        data, bandwidth=0.1, num_bins=60, num_blocks=4
    )

    fes_sharded, err_sharded = kde_mod._kde_fes_sharded(
        data[: (len(data) // 4) * 4, None],
        axes_small[0][:, None],
        0.1,
        kde_mod.KB_KJ_MOL * 300.0,
        4,
    )
    np.testing.assert_allclose(fes_sharded, fes_small, atol=1e-3)
    np.testing.assert_allclose(err_sharded, err_small, atol=1e-3)


def test_fit_ensemble_shards_tries_over_devices(rng):
    """With T divisible by the device count, the ensemble trainer shards the
    TRIES axis over the mesh (each device trains its restarts, zero
    collectives) and reproduces the serial per-seed results."""
    import jax
    import jax.numpy as jnp

    from deep_cartograph_tpu.models.training import Trainer, TrainerConfig

    n_dev = len(jax.devices())
    assert n_dev > 1
    T = n_dev  # divisible -> try-sharded regime
    seeds = list(range(1, T + 1))

    full = {"data": rng.standard_normal((96, 4)).astype(np.float32)}
    config = TrainerConfig(
        batch_size=16,
        max_epochs=8,
        shuffle=True,
        check_val_every_n_epoch=1,
        early_stop_patience=100,
        optimizer_name="Adam",
        optimizer_kwargs={"lr": 0.05},
        device="default",  # stay on the (virtual) multi-device backend
    )

    def loss_fn(params, batch, rng_, beta):
        pred = batch["data"] @ params["w"]
        target = jnp.sum(batch["data"], axis=1, keepdims=True)
        err = jnp.mean((pred - target) ** 2, axis=1)
        w = batch["weight"]
        return jnp.sum(err * w) / jnp.maximum(jnp.sum(w), 1e-9), {}

    def init():
        return {"w": jnp.zeros((4, 1), jnp.float32)}

    trainer = Trainer(loss_fn, config)
    train_rows, valid_rows = [], []
    for s in seeds:
        order = np.random.default_rng(s).permutation(96)
        train_rows.append(order[:80])
        valid_rows.append(order[80:])
    train_idx = np.asarray(train_rows, np.int32)
    valid_idx = np.asarray(valid_rows, np.int32)
    params_stack = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[init() for _ in seeds]
    )
    results = trainer.fit_ensemble(
        params_stack, full, train_idx, valid_idx, seeds
    )

    # serial reference for two of the tries
    for t in (0, T - 1):
        train = {k: v[train_idx[t]] for k, v in full.items()}
        valid = {k: v[valid_idx[t]] for k, v in full.items()}
        res_s = trainer.fit(init(), train, valid, seed=seeds[t])
        np.testing.assert_allclose(results[t].score, res_s.score, rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(results[t].params["w"]),
            np.asarray(res_s.params["w"]),
            rtol=1e-5, atol=1e-7,
        )
