"""Training-engine behavior tests: schedulers, early stopping, KL annealing,
explicit validation data, and cross-topology multi-trajectory training."""

import numpy as np
import pytest

from deep_cartograph_tpu.models.training import (
    KLAnnealing,
    ReduceLROnPlateau,
    Trainer,
    TrainerConfig,
)


def _toy_data(rng, n=200, d=4):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return {"data": x}


def _mse_loss(module_w=None):
    import jax.numpy as jnp

    def loss_fn(params, batch, rng, beta):
        pred = batch["data"] @ params["w"]
        target = jnp.sum(batch["data"], axis=1, keepdims=True)
        err = jnp.mean((pred - target) ** 2, axis=1)
        w = batch["weight"]
        return jnp.sum(err * w) / jnp.maximum(jnp.sum(w), 1e-9), {}

    return loss_fn


def _init_params(d=4):
    import jax.numpy as jnp

    return {"w": jnp.zeros((d, 1), jnp.float32)}


def test_save_check_every_n_epoch_gates_checkpoints(rng):
    """Checkpoint capture only on the save cadence (Lightning
    ModelCheckpoint every_n_epochs; reference train_colvars.py:60-61)."""
    config = TrainerConfig(
        batch_size=32,
        max_epochs=20,
        check_val_every_n_epoch=1,
        save_check_every_n_epoch=7,
        early_stop_patience=100,
        optimizer_name="Adam",
        optimizer_kwargs={"lr": 0.05},
    )
    trainer = Trainer(_mse_loss(), config)
    result = trainer.fit(
        _init_params(), _toy_data(rng), _toy_data(rng, n=50), seed=0
    )
    # loss decreases monotonically here, so best = last eligible epoch
    assert (result.best_epoch + 1) % 7 == 0
    # validation itself still ran every epoch
    assert result.metrics["epoch"] == list(range(20))


def test_misaligned_save_cadence_falls_back_to_validations(rng):
    """check_val=7, save=10 never align within 20 epochs; the Trainer must
    still capture a best checkpoint (at a validation) instead of silently
    returning last-epoch params."""
    config = TrainerConfig(
        batch_size=32,
        max_epochs=20,
        check_val_every_n_epoch=7,
        save_check_every_n_epoch=10,
        early_stop_patience=100,
        optimizer_name="Adam",
        optimizer_kwargs={"lr": 0.05},
    )
    trainer = Trainer(_mse_loss(), config)
    result = trainer.fit(
        _init_params(), _toy_data(rng), _toy_data(rng, n=50), seed=0
    )
    assert result.best_epoch >= 0
    assert result.description == "best overall"
    # captured at a validation epoch (multiples of 7)
    assert (result.best_epoch + 1) % 7 == 0


def test_iter_featurize_yields_per_trajectory(ca_system, tmp_path):
    """iter_featurize_trajectories emits (path, features) in order, with
    chunks spanning trajectory seams, matching the direct evaluation."""
    from deep_cartograph_tpu.geom.engine import Featurizer
    from deep_cartograph_tpu.io.dcd import write_dcd
    from deep_cartograph_tpu.io.topology import Topology

    sizes = [25, 7, 28]
    paths, start = [], 0
    for i, n in enumerate(sizes):
        p = str(tmp_path / f"seg{i}.dcd")
        write_dcd(p, ca_system.coords[start : start + n])
        paths.append(p)
        start += n

    top = Topology.from_file(ca_system.pdb_path)
    labels = ["dist-@CA_1-@CA_5", "dist-@CA_2-@CA_7"]
    featurizer = Featurizer(top, labels, device="cpu")
    got = list(
        featurizer.iter_featurize_trajectories(paths, frame_chunk=16)
    )
    assert [p for p, _ in got] == paths
    start = 0
    for (_, feats), n in zip(got, sizes):
        assert feats.shape == (n, 2)
        expected = featurizer(ca_system.coords[start : start + n])
        np.testing.assert_allclose(feats, expected, atol=1e-5)
        start += n


def test_trainer_learns_and_early_stops(rng):
    config = TrainerConfig(
        batch_size=32,
        max_epochs=500,
        early_stop_patience=10,
        early_stop_min_delta=1e-7,
        optimizer_name="Adam",
        optimizer_kwargs={"lr": 0.05},
    )
    trainer = Trainer(_mse_loss(), config)
    train = _toy_data(rng)
    valid = _toy_data(rng, n=50)
    result = trainer.fit(_init_params(), train, valid, seed=0)
    assert result.score < 1e-3
    # early stopping fired well before max_epochs
    assert result.metrics["epoch"][-1] < 400
    assert result.description == "best overall"
    np.testing.assert_allclose(
        np.asarray(result.params["w"]).ravel(), np.ones(4), atol=0.05
    )


def test_onecycle_lr_schedule_recorded(rng):
    config = TrainerConfig(
        batch_size=32,
        max_epochs=30,
        early_stop_patience=100,
        optimizer_name="Adam",
        optimizer_kwargs={"lr": 1e-3},
        lr_scheduler={"name": "OneCycleLR", "kwargs": {"max_lr": 0.05}},
    )
    trainer = Trainer(_mse_loss(), config)
    result = trainer.fit(
        _init_params(), _toy_data(rng), _toy_data(rng, n=50), seed=0
    )
    lrs = result.metrics["lr"]
    # warmup then decay shape
    assert max(lrs) > lrs[0]
    assert lrs[-1] < max(lrs)


def test_reduce_on_plateau_scales_lr():
    sched = ReduceLROnPlateau(factor=0.1, patience=2, cooldown=0, start_epoch=5)
    # before start_epoch: no effect
    assert sched.step(0, 1.0) == 1.0
    # constant loss after start: trips after patience exceeded
    scales = [sched.step(e, 1.0) for e in range(5, 15)]
    assert min(scales) <= 0.1 + 1e-12


def test_kl_annealing_schedules():
    lin = KLAnnealing(type="linear", start_beta=0.0, max_beta=1.0,
                      start_epoch=10, n_epochs_anneal=10)
    assert lin.beta(5) == 0.0
    assert abs(lin.beta(15) - 0.5) < 1e-9
    assert lin.beta(25) == 1.0

    sig = KLAnnealing(type="sigmoid", start_beta=0.0, max_beta=1.0,
                      start_epoch=10, n_epochs_anneal=10)
    assert sig.beta(5) == 0.0
    assert sig.beta(11) < 0.2
    assert sig.beta(30) > 0.95
    mid = sig.beta(15)
    assert 0.3 < mid < 0.7

    cyc = KLAnnealing(type="cyclical", start_beta=0.0, max_beta=1.0,
                      start_epoch=0, n_cycles=2, n_epochs_anneal=20)
    # cycle length 10, ramp over first 5 epochs of each cycle
    assert cyc.beta(1) < cyc.beta(5)
    assert cyc.beta(11) < 1.0  # reset at cycle boundary
    assert cyc.beta(25) == 1.0  # after annealing: stays at max


def test_deep_cv_with_explicit_validation(tmp_path, ca_system, rng):
    """AE training with separately provided validation colvars."""
    from tests.test_cv import base_config
    from deep_cartograph_tpu.cv import cv_calculators_map
    from deep_cartograph_tpu.io.colvars import write_colvars

    labels = ["dist-@CA_1-@CA_5", "dist-@CA_2-@CA_7", "dist-@CA_3-@CA_9"]

    def make_colvars(path, n):
        data = rng.standard_normal((n, 3)).astype(np.float32) * 0.1 + 0.6
        t = np.arange(n, dtype=np.float32)
        write_colvars(path, np.column_stack([t, data]), ["time"] + labels)

    train_path = str(tmp_path / "train.dat")
    val_path = str(tmp_path / "val.dat")
    make_colvars(train_path, 150)
    make_colvars(val_path, 60)

    cfg = base_config()
    cfg["training"]["general"]["max_epochs"] = 10
    calc = cv_calculators_map["ae"](configuration=cfg, output_path=str(tmp_path))
    calc.load_training_data([train_path], [ca_system.pdb_path],
                            features_list=labels)
    calc.load_validation_data([val_path], [ca_system.pdb_path],
                              features_list=labels)
    projection = calc.run()
    assert projection is not None and projection.shape == (150, 2)
    # validation metrics computed on the provided set
    assert len(calc.metrics["valid_loss"]) > 3


def test_train_colvars_cross_topology(tmp_path, ca_system, rng):
    """Two trajectories with different residue numbering train one CV via
    feature translation (the multi-topology path)."""
    from tests.fixtures import make_shifted_ca_pdb
    from tests.test_cv import base_config
    from deep_cartograph_tpu.cv import cv_calculators_map
    from deep_cartograph_tpu.io.colvars import write_colvars

    # Topology B = same chain, resids shifted by +100
    shifted_pdb = make_shifted_ca_pdb(str(tmp_path), ca_system, 100)

    ref_labels = ["dist-@CA_1-@CA_5", "dist-@CA_2-@CA_7", "dist-@CA_3-@CA_9"]
    shifted_labels = [
        "dist-@CA_101-@CA_105", "dist-@CA_102-@CA_107", "dist-@CA_103-@CA_109"
    ]

    data_a = rng.standard_normal((80, 3)).astype(np.float32) * 0.1 + 0.5
    data_b = rng.standard_normal((80, 3)).astype(np.float32) * 0.1 + 0.5
    path_a = str(tmp_path / "a.dat")
    path_b = str(tmp_path / "b.dat")
    t = np.arange(80, dtype=np.float32)
    write_colvars(path_a, np.column_stack([t, data_a]), ["time"] + ref_labels)
    write_colvars(path_b, np.column_stack([t, data_b]), ["time"] + shifted_labels)

    calc = cv_calculators_map["pca"](
        configuration=base_config(), output_path=str(tmp_path)
    )
    calc.load_training_data(
        [path_a, path_b],
        [ca_system.pdb_path, shifted_pdb],
        ref_topology_path=ca_system.pdb_path,
        features_list=ref_labels,
    )
    assert calc.training_data.shape == (160, 3)
    assert list(np.unique(calc.training_data_labels)) == [0, 1]
    projection = calc.run()
    assert projection.shape == (160, 2)


def test_fit_ensemble_matches_serial(rng):
    """fit_ensemble (all tries as one vmapped program) reproduces the serial
    per-seed fits: same splits, same RNG streams, same selection rules."""
    import jax
    import jax.numpy as jnp

    full = _toy_data(rng, n=120)
    n = 120
    n_train = 96
    seeds = [11, 12, 13]
    config = TrainerConfig(
        batch_size=32,
        max_epochs=15,
        shuffle=True,
        check_val_every_n_epoch=1,
        early_stop_patience=50,
        optimizer_name="Adam",
        optimizer_kwargs={"lr": 0.05},
        device="cpu",
    )
    trainer = Trainer(_mse_loss(), config)

    # per-seed random splits, exactly like NonLinear._split
    train_rows, valid_rows = [], []
    for s in seeds:
        order = np.random.default_rng(s).permutation(n)
        train_rows.append(order[:n_train])
        valid_rows.append(order[n_train:])
    train_idx = np.asarray(train_rows, np.int32)
    valid_idx = np.asarray(valid_rows, np.int32)

    serial = []
    for t, s in enumerate(seeds):
        train = {k: v[train_idx[t]] for k, v in full.items()}
        valid = {k: v[valid_idx[t]] for k, v in full.items()}
        serial.append(trainer.fit(_init_params(), train, valid, seed=s))

    params_stack = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[_init_params() for _ in seeds]
    )
    ensemble = trainer.fit_ensemble(
        params_stack, full, train_idx, valid_idx, seeds
    )

    assert len(ensemble) == len(serial)
    for res_s, res_e in zip(serial, ensemble):
        assert res_e.best_epoch == res_s.best_epoch
        assert res_e.description == res_s.description
        np.testing.assert_allclose(res_e.score, res_s.score, rtol=5e-5)
        np.testing.assert_allclose(
            np.asarray(res_e.params["w"]),
            np.asarray(res_s.params["w"]),
            rtol=5e-5,
            atol=1e-6,
        )
        np.testing.assert_allclose(
            res_e.metrics["valid_loss"], res_s.metrics["valid_loss"],
            rtol=5e-5,
        )


def test_fit_ensemble_provided_validation_matches_serial(rng):
    """Provided-validation case (cv/deep.py: valid_idx = arange(n_valid)
    into a SEPARATE validation dict): the device program must gather
    validation rows from valid_data, not the training set. Regression for
    the round-2 advisor finding (early stopping / model selection silently
    used training rows)."""
    import jax
    import jax.numpy as jnp

    full = _toy_data(rng, n=96)
    # Distinct validation set, longer than the training set would make the
    # old index-clamping bug visible too.
    valid = _toy_data(np.random.default_rng(999), n=40)
    seeds = [21, 22]
    config = TrainerConfig(
        batch_size=32,
        max_epochs=12,
        shuffle=True,
        check_val_every_n_epoch=1,
        early_stop_patience=50,
        optimizer_name="Adam",
        optimizer_kwargs={"lr": 0.05},
        device="cpu",
    )
    trainer = Trainer(_mse_loss(), config)

    serial = [
        trainer.fit(_init_params(), full, valid, seed=s) for s in seeds
    ]

    T = len(seeds)
    train_idx = np.tile(np.arange(96, dtype=np.int32), (T, 1))
    valid_idx = np.tile(np.arange(40, dtype=np.int32), (T, 1))
    params_stack = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[_init_params() for _ in seeds]
    )
    ensemble = trainer.fit_ensemble(
        params_stack, full, train_idx, valid_idx, seeds, valid_data=valid
    )

    for res_s, res_e in zip(serial, ensemble):
        assert res_e.best_epoch == res_s.best_epoch
        assert res_e.description == res_s.description
        np.testing.assert_allclose(res_e.score, res_s.score, rtol=1e-5)
        np.testing.assert_allclose(
            res_e.metrics["valid_loss"], res_s.metrics["valid_loss"],
            rtol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(res_e.params["w"]),
            np.asarray(res_s.params["w"]),
            rtol=1e-5,
            atol=1e-6,
        )


def test_fit_ensemble_early_stop_freezes_per_try(rng):
    """A try that hits patience stops updating its best/metrics while the
    others continue (per-try early-stopping semantics preserved)."""
    import jax
    import jax.numpy as jnp

    full = _toy_data(rng, n=80)
    seeds = [1, 2]
    config = TrainerConfig(
        batch_size=16,
        max_epochs=25,
        shuffle=False,
        check_val_every_n_epoch=1,
        early_stop_patience=3,
        early_stop_min_delta=1e9,  # nothing ever "improves": stop at 3 checks
        optimizer_name="Adam",
        optimizer_kwargs={"lr": 0.05},
        device="cpu",
    )
    trainer = Trainer(_mse_loss(), config)
    train_idx = np.tile(np.arange(64, dtype=np.int32), (2, 1))
    valid_idx = np.tile(np.arange(64, 80, dtype=np.int32), (2, 1))
    params_stack = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[_init_params() for _ in seeds]
    )
    results = trainer.fit_ensemble(
        params_stack, full, train_idx, valid_idx, seeds
    )
    for res in results:
        # first check improves from inf, then `patience` bad checks -> stop
        assert len(res.metrics["epoch"]) == 4


def test_fit_ensemble_with_plateau_scheduler(rng):
    """ReduceLROnPlateau forces one epoch per dispatch in the ensemble and
    scales each try's LR independently (per-try host-side plateau state)."""
    import jax
    import jax.numpy as jnp

    full = _toy_data(rng, n=80)
    seeds = [3, 4]
    config = TrainerConfig(
        batch_size=16,
        max_epochs=12,
        shuffle=False,
        check_val_every_n_epoch=1,
        early_stop_patience=100,
        optimizer_name="Adam",
        optimizer_kwargs={"lr": 0.05},
        lr_scheduler={
            "name": "ReduceLROnPlateau",
            "kwargs": {"factor": 0.5, "patience": 2, "cooldown": 0,
                       "start_epoch": 0},
        },
        device="cpu",
    )
    trainer = Trainer(_mse_loss(), config)
    train_idx = np.tile(np.arange(64, dtype=np.int32), (2, 1))
    valid_idx = np.tile(np.arange(64, 80, dtype=np.int32), (2, 1))
    params_stack = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[_init_params() for _ in seeds]
    )
    results = trainer.fit_ensemble(
        params_stack, full, train_idx, valid_idx, seeds
    )

    # serial reference: identical per-try results under the same scheduler
    for t, s in enumerate(seeds):
        train = {k: v[train_idx[t]] for k, v in full.items()}
        valid = {k: v[valid_idx[t]] for k, v in full.items()}
        res_s = trainer.fit(_init_params(), train, valid, seed=s)
        np.testing.assert_allclose(
            results[t].metrics["valid_loss"], res_s.metrics["valid_loss"],
            rtol=1e-5,
        )
        np.testing.assert_allclose(
            results[t].metrics["lr"], res_s.metrics["lr"], rtol=1e-5
        )


def test_validation_never_improved_predicate():
    """The soft convergence warning's predicate (the reference's own
    `min(loss) > loss[0]` can never fire; ours can)."""
    from deep_cartograph_tpu.cv.deep import validation_never_improved

    assert validation_never_improved([5.0, 6.0, 7.0])      # got worse
    assert validation_never_improved([5.0, 5.0, 5.0])      # flat
    assert not validation_never_improved([5.0, 4.0, 6.0])  # improved once
    assert not validation_never_improved([5.0])            # single check
    assert not validation_never_improved([])


def test_fit_ensemble_onecycle_lr_metric_matches_serial(rng):
    """The ensemble's reconstructed OneCycle lr metric equals the serial
    path's opt_state readback at every validation epoch."""
    import jax
    import jax.numpy as jnp

    full = _toy_data(rng, n=96)
    seeds = [7]
    config = TrainerConfig(
        batch_size=32,
        max_epochs=12,
        shuffle=False,
        check_val_every_n_epoch=1,
        early_stop_patience=100,
        optimizer_name="Adam",
        optimizer_kwargs={"lr": 1e-3},
        lr_scheduler={"name": "OneCycleLR", "kwargs": {"max_lr": 0.05}},
        device="cpu",
    )
    trainer = Trainer(_mse_loss(), config)
    train_idx = np.arange(64, dtype=np.int32)[None]
    valid_idx = np.arange(64, 96, dtype=np.int32)[None]
    params_stack = jax.tree.map(lambda a: a[None], _init_params())
    res_e = trainer.fit_ensemble(
        params_stack, full, train_idx, valid_idx, seeds
    )[0]
    res_s = trainer.fit(
        _init_params(),
        {k: v[train_idx[0]] for k, v in full.items()},
        {k: v[valid_idx[0]] for k, v in full.items()},
        seed=seeds[0],
    )
    np.testing.assert_allclose(res_e.metrics["lr"], res_s.metrics["lr"],
                               rtol=1e-6)
    np.testing.assert_allclose(
        res_e.metrics["valid_loss"], res_s.metrics["valid_loss"], rtol=1e-5
    )


def test_validation_runs_in_eval_mode(rng):
    """Losses exposing a `train` kwarg are evaluated with train=False at
    validation checks (dropout off — Lightning model.eval() parity);
    legacy losses without the kwarg still work."""
    import jax
    import jax.numpy as jnp

    calls = []

    def loss_with_train(params, batch, rng_, beta, train=True):
        calls.append(bool(train))
        pred = batch["data"] @ params["w"]
        target = jnp.sum(batch["data"], axis=1, keepdims=True)
        mse = jnp.mean((pred - target) ** 2, axis=-1)
        return jnp.sum(mse * batch["weight"]) / jnp.sum(batch["weight"]), {}

    full = _toy_data(rng, n=64)
    config = TrainerConfig(
        batch_size=32, max_epochs=3, shuffle=False,
        check_val_every_n_epoch=1, early_stop_patience=50,
        optimizer_name="Adam", optimizer_kwargs={"lr": 0.05}, device="cpu",
    )
    trainer = Trainer(loss_with_train, config)
    train = {k: v[:48] for k, v in full.items()}
    valid = {k: v[48:] for k, v in full.items()}
    trainer.fit(_init_params(), train, valid, seed=0)
    # Tracing happens once per program: the training program traced with
    # train=True, the eval program with train=False.
    assert True in calls and False in calls

    # ensemble path: eval also pinned to train=False
    calls.clear()
    trainer2 = Trainer(loss_with_train, config)
    trainer2.fit_ensemble(
        jax.tree.map(lambda a: a[None], _init_params()),
        full,
        np.arange(48, dtype=np.int32)[None],
        np.arange(48, 64, dtype=np.int32)[None],
        [0],
    )
    assert True in calls and False in calls


def test_fit_ensemble_index_offsets_zero_copy_lag(rng):
    """Zero-copy lagged batching: passing ONE buffer as both "data" and
    "data_lag" with index_offsets={"data_lag": lag} reproduces the explicit
    two-copy path bit-for-bit (same gathers, same RNG streams). This is the
    HBM-halving path that makes full-filtered-width deep-TICA fit at
    config-5 scale."""
    import jax
    import jax.numpy as jnp

    lag = 7
    n = 131
    x = rng.standard_normal((n, 4)).astype(np.float32)

    def lag_loss():
        def loss_fn(params, batch, rng_, beta):
            a = batch["data"] @ params["w"]
            b = batch["data_lag"] @ params["w"]
            err = jnp.mean((a - b) ** 2, axis=1) + 0.01 * jnp.mean(
                (a - 1.0) ** 2, axis=1
            )
            w = batch["weight"]
            return jnp.sum(err * w) / jnp.maximum(jnp.sum(w), 1e-9), {}

        return loss_fn

    config = TrainerConfig(
        batch_size=32,
        max_epochs=8,
        shuffle=True,
        check_val_every_n_epoch=1,
        early_stop_patience=50,
        optimizer_name="Adam",
        optimizer_kwargs={"lr": 0.05},
        device="cpu",
        ensemble_epoch_chunk=4,
    )
    seeds = [3, 4]
    n_pairs = n - lag
    order = np.random.default_rng(0).permutation(n_pairs).astype(np.int32)
    train_idx = np.stack([order[:96]] * len(seeds))
    valid_idx = np.stack([order[96:]] * len(seeds))
    params_stack = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[_init_params() for _ in seeds]
    )

    # Explicit two-copy path: materialized x_t / x_lag, same pair indices.
    explicit = Trainer(lag_loss(), config).fit_ensemble(
        params_stack,
        {"data": x[:-lag], "data_lag": x[lag:]},
        train_idx,
        valid_idx,
        seeds,
    )

    # Zero-copy path: ONE buffer, lag applied as a gather-index offset.
    zero_copy = Trainer(lag_loss(), config).fit_ensemble(
        params_stack,
        {"data": x, "data_lag": x},
        train_idx,
        valid_idx,
        seeds,
        index_offsets={"data_lag": lag},
    )

    for res_e, res_z in zip(explicit, zero_copy):
        assert res_e.best_epoch == res_z.best_epoch
        np.testing.assert_array_equal(
            np.asarray(res_e.params["w"]), np.asarray(res_z.params["w"])
        )
        np.testing.assert_array_equal(
            res_e.metrics["valid_loss"], res_z.metrics["valid_loss"]
        )


def test_fit_ensemble_index_offsets_explicit_valid_data(rng):
    """Training offsets describe full_data's row layout; an EXPLICIT
    valid_data dict (its own already-lagged buffers) must not inherit
    them — a regression once shifted the validation gather by +lag,
    clamp-reading past the end and corrupting checkpoint selection."""
    import jax
    import jax.numpy as jnp

    lag = 7
    n = 131
    x = rng.standard_normal((n, 4)).astype(np.float32)
    v = rng.standard_normal((24 + lag, 4)).astype(np.float32)

    def lag_loss():
        def loss_fn(params, batch, rng_, beta):
            a = batch["data"] @ params["w"]
            b = batch["data_lag"] @ params["w"]
            err = jnp.mean((a - b) ** 2, axis=1) + 0.01 * jnp.mean(
                (a - 1.0) ** 2, axis=1
            )
            w = batch["weight"]
            return jnp.sum(err * w) / jnp.maximum(jnp.sum(w), 1e-9), {}

        return loss_fn

    config = TrainerConfig(
        batch_size=32,
        max_epochs=6,
        shuffle=True,
        check_val_every_n_epoch=1,
        early_stop_patience=50,
        optimizer_name="Adam",
        optimizer_kwargs={"lr": 0.05},
        device="cpu",
        ensemble_epoch_chunk=3,
    )
    seeds = [5]
    n_pairs = n - lag
    train_idx = np.arange(n_pairs, dtype=np.int32)[None][:, :96]
    valid_idx = np.arange(24, dtype=np.int32)[None]
    params_stack = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[_init_params() for _ in seeds]
    )
    valid_data = {"data": v[:-lag][:24], "data_lag": v[lag:][:24]}

    # Reference: two-copy training buffers, same explicit validation dict.
    explicit = Trainer(lag_loss(), config).fit_ensemble(
        params_stack,
        {"data": x[:-lag], "data_lag": x[lag:]},
        train_idx,
        valid_idx,
        seeds,
        valid_data=valid_data,
    )
    # Zero-copy training buffers + the SAME explicit validation dict: the
    # training offset must not leak into the validation gather.
    zero_copy = Trainer(lag_loss(), config).fit_ensemble(
        params_stack,
        {"data": x, "data_lag": x},
        train_idx,
        valid_idx,
        seeds,
        valid_data=valid_data,
        index_offsets={"data_lag": lag},
    )
    for res_e, res_z in zip(explicit, zero_copy):
        np.testing.assert_array_equal(
            res_e.metrics["valid_loss"], res_z.metrics["valid_loss"]
        )
        np.testing.assert_array_equal(
            np.asarray(res_e.params["w"]), np.asarray(res_z.params["w"])
        )
