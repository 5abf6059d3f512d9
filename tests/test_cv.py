"""CV calculator tests: linear (PCA/TICA/HTICA), deep (AE/VAE/DeepTICA), UMAP,
model.zip round trips, PLUMED export."""

import os
import zipfile

import numpy as np
import pytest

from deep_cartograph_tpu.cv import cv_calculators_map
from deep_cartograph_tpu.io.colvars import write_colvars


@pytest.fixture(scope="module")
def cv_dataset(tmp_path_factory, ca_system):
    """Synthetic two-state colvars dataset tied to the CA topology."""
    root = tmp_path_factory.mktemp("cv_data")
    rng = np.random.default_rng(3)
    n = 400
    labels = [
        "dist-@CA_1-@CA_5",
        "dist-@CA_2-@CA_7",
        "dist-@CA_3-@CA_9",
        "dist-@CA_1-@CA_9",
        "dist-@CA_4-@CA_10",
        "dist-@CA_2-@CA_11",
    ]
    # slow two-state signal + correlated/noisy channels
    state = np.zeros(n)
    for i in range(1, n):
        flip = rng.random() < 0.01
        state[i] = 1 - state[i - 1] if flip else state[i - 1]
    slow = state + 0.05 * rng.standard_normal(n)
    data = np.zeros((n, len(labels)), np.float32)
    data[:, 0] = 0.5 + 0.3 * slow
    data[:, 1] = 0.7 - 0.2 * slow + 0.02 * rng.standard_normal(n)
    data[:, 2] = 0.6 + 0.05 * rng.standard_normal(n)
    data[:, 3] = 0.9 + 0.1 * slow + 0.05 * rng.standard_normal(n)
    data[:, 4] = 0.4 + 0.03 * rng.standard_normal(n)
    data[:, 5] = 0.8 + 0.15 * slow + 0.03 * rng.standard_normal(n)
    time_col = np.arange(n, dtype=np.float32)
    path = os.path.join(str(root), "colvars.dat")
    write_colvars(path, np.column_stack([time_col, data]), ["time"] + labels, fmt="%.6f")
    return {
        "colvars": path,
        "labels": labels,
        "data": data,
        "topology": ca_system.pdb_path,
        "root": str(root),
    }


def base_config(**overrides):
    cfg = {
        "dimension": 2,
        "lag_time": 1,
        "tica_regularization": 1e-6,
        "features_normalization": "mean_std",
        "input_colvars": {},
        "num_subspaces": 2,
        "subspaces_dimension": 2,
        "bias": {
            "method": "opes_metad",
            "args": {
                "temperature": 300.0,
                "sigma": 0.05,
                "pace": 500,
                "grid_min": -1.0,
                "grid_max": 1.0,
                "grid_bin": 300,
                "height": 1.0,
                "bias_factor": 10.0,
                "barrier": 50.0,
                "observation_steps": 100,
                "compression_threshold": 0.1,
            },
            "add_rmsd_restraint": False,
            "align_waypoint_structures": True,
            "rmsd_restraint_k": 5000.0,
            "rmsd_restraint_eq": 0.4,
        },
        "architecture": {
            "encoder": {
                "layers": [8],
                "activation": ["tanh"],
                "dropout": [None],
                "batchnorm": [False],
                "last_layer_activation": None,
                "last_layer_batchnorm": False,
                "last_layer_dropout": None,
            },
            "decoder": {
                "layers": [8],
                "activation": ["tanh"],
                "dropout": [None],
                "batchnorm": [False],
                "last_layer_activation": None,
                "last_layer_batchnorm": False,
                "last_layer_dropout": None,
            },
        },
        "training": {
            "general": {
                "num_tries": 1,
                "seed": 42,
                "lengths": [0.8, 0.2],
                "batch_size": 64,
                "max_epochs": 40,
                "shuffle": True,
                "random_split": True,
                "check_val_every_n_epoch": 1,
                "save_check_every_n_epoch": 1,
            },
            "early_stopping": {"patience": 50, "min_delta": 1e-6},
            "optimizer": {"name": "Adam", "kwargs": {"lr": 1e-2, "weight_decay": 0.0}},
            "lr_scheduler": None,
            "kl_annealing": None,
            "save_loss": True,
            "plot_loss": False,
            "model_to_save": "best",
        },
    }
    cfg.update(overrides)
    return cfg


def _train(cv_name, cv_dataset, tmp_path, config=None):
    calc = cv_calculators_map[cv_name](
        configuration=config or base_config(), output_path=str(tmp_path)
    )
    calc.load_training_data(
        [cv_dataset["colvars"]],
        [cv_dataset["topology"]],
        features_list=cv_dataset["labels"],
    )
    projection = calc.run()
    return calc, projection


def _roundtrip_check(cv_name, calc, projection, cv_dataset, tmp_path):
    from deep_cartograph_tpu.cv.base import CVCalculator

    model_zip = os.path.join(str(tmp_path), cv_name, "model.zip")
    assert os.path.exists(model_zip)
    loaded = CVCalculator.load(model_zip, os.path.join(str(tmp_path), "reload"))
    reprojected = loaded.project_colvars(
        [cv_dataset["colvars"]], [cv_dataset["topology"]]
    )
    np.testing.assert_allclose(
        reprojected.to_numpy(), projection.to_numpy(), atol=2e-4
    )


def test_pca_matches_sklearn(cv_dataset, tmp_path):
    calc, projection = _train("pca", cv_dataset, tmp_path)
    assert projection.shape == (400, 2)
    assert list(projection.columns) == ["PC 1", "PC 2"]
    # projected training data normalized to [-1, 1]
    assert projection.to_numpy().min() >= -1.0001
    assert projection.to_numpy().max() <= 1.0001

    from sklearn.decomposition import PCA as SkPCA

    normalized = (
        cv_dataset["data"] - cv_dataset["data"].mean(0)
    ) / cv_dataset["data"].std(0)
    sk = SkPCA(n_components=2).fit(normalized)
    w = sk.components_.T.copy()
    ours = np.asarray(calc.cv).copy()
    # canonicalize BOTH sides to first-element-positive, then compare the
    # SIGNED vectors — |.|-only comparison would pass per-element sign
    # errors (a wrong reflection) that change the projected subspace
    for arr in (w, ours):
        for i in range(2):
            if arr[0, i] < 0:
                arr[:, i] = -arr[:, i]
    np.testing.assert_allclose(ours, w, atol=2e-4)
    _roundtrip_check("pca", calc, projection, cv_dataset, tmp_path)


def test_tica_and_roundtrip(cv_dataset, tmp_path):
    calc, projection = _train("tica", cv_dataset, tmp_path)
    assert projection.shape == (400, 2)
    assert calc.eigenvalues_[0] > 0.5  # slow mode present
    _roundtrip_check("tica", calc, projection, cv_dataset, tmp_path)


def test_htica_and_roundtrip(cv_dataset, tmp_path):
    calc, projection = _train("htica", cv_dataset, tmp_path)
    assert projection.shape == (400, 2)
    # HTICA should find a similar slow mode to full TICA
    assert calc.eigenvalues_[0] > 0.5
    _roundtrip_check("htica", calc, projection, cv_dataset, tmp_path)


def test_ae_trains_and_roundtrips(cv_dataset, tmp_path):
    calc, projection = _train("ae", cv_dataset, tmp_path)
    assert projection is not None and projection.shape == (400, 2)
    assert np.isfinite(projection.to_numpy()).all()
    # metrics recorded
    assert len(calc.metrics["valid_loss"]) > 5
    _roundtrip_check("ae", calc, projection, cv_dataset, tmp_path)
    # TorchScript twin produces the same projection
    import torch

    model_zip = os.path.join(str(tmp_path), "ae", "model.zip")
    with zipfile.ZipFile(model_zip) as zf:
        assert "model/cv_weights.pt" in zf.namelist()
        zf.extract("model/cv_weights.pt", str(tmp_path / "ts"))
    ts = torch.jit.load(str(tmp_path / "ts" / "model" / "cv_weights.pt"))
    with torch.no_grad():
        out = ts(torch.from_numpy(cv_dataset["data"])).numpy()
    np.testing.assert_allclose(out, projection.to_numpy(), atol=2e-4)


def test_vae_trains(cv_dataset, tmp_path):
    cfg = base_config()
    cfg["training"]["general"]["max_epochs"] = 30
    cfg["training"]["kl_annealing"] = {
        "type": "linear",
        "start_beta": 1e-6,
        "max_beta": 0.01,
        "start_epoch": 5,
        "n_cycles": 1,
        "n_epochs_anneal": 10,
    }
    calc, projection = _train("vae", cv_dataset, tmp_path, cfg)
    assert projection is not None and projection.shape == (400, 2)
    assert "beta" in calc.metrics
    assert "valid_kl_loss" in calc.metrics
    _roundtrip_check("vae", calc, projection, cv_dataset, tmp_path)


def test_deep_tica_trains(cv_dataset, tmp_path):
    calc, projection = _train("deep_tica", cv_dataset, tmp_path)
    assert projection is not None and projection.shape == (400, 2)
    # eigenvalues bounded by 1, slow mode present
    assert calc.eigenvalues_[0] <= 1.0 + 1e-3
    assert calc.eigenvalues_[0] > 0.5
    assert calc.cv_score >= -2.0 - 1e-3  # sanity bound
    _roundtrip_check("deep_tica", calc, projection, cv_dataset, tmp_path)


def test_umap_fits_and_roundtrips(cv_dataset, tmp_path):
    cfg = base_config()
    calc, projection = _train("umap", cv_dataset, tmp_path, cfg)
    assert projection is not None and projection.shape == (400, 2)
    emb = projection.to_numpy()
    assert np.isfinite(emb).all()
    # transform() is an approximate re-embedding (as in umap-learn), so the
    # roundtrip check is correlation, not exact equality.
    from deep_cartograph_tpu.cv.base import CVCalculator

    model_zip = os.path.join(str(tmp_path), "umap", "model.zip")
    loaded = CVCalculator.load(model_zip, os.path.join(str(tmp_path), "reload"))
    reproj = loaded.project_colvars(
        [cv_dataset["colvars"]], [cv_dataset["topology"]]
    ).to_numpy()
    for d in range(2):
        corr = np.corrcoef(reproj[:, d], emb[:, d])[0, 1]
        assert abs(corr) > 0.9, f"dim {d} corr {corr}"


def test_plumed_export_linear(cv_dataset, tmp_path):
    calc, _ = _train("pca", cv_dataset, tmp_path)
    out = tmp_path / "plumed_out"
    out.mkdir()
    calc.write_plumed_files(cv_dataset["topology"], str(out))
    assert (out / "plumed_pca_unbiased.zip").exists()
    assert (out / "plumed_pca_biased.zip").exists()
    with zipfile.ZipFile(out / "plumed_pca_unbiased.zip") as zf:
        names = zf.namelist()
        input_name = [n for n in names if n.startswith("plumed_input")][0]
        text = zf.read(input_name).decode()
    assert "COMBINE" in text and "MOLINFO" in text
    assert "norm_pca_0" in text and "norm_pca_1" in text


def test_plumed_export_nonlinear(cv_dataset, tmp_path):
    calc, _ = _train("ae", cv_dataset, tmp_path)
    out = tmp_path / "plumed_out"
    out.mkdir()
    calc.write_plumed_files(cv_dataset["topology"], str(out))
    with zipfile.ZipFile(out / "plumed_ae_unbiased.zip") as zf:
        names = zf.namelist()
        assert any(n.endswith("ae_weights.pt") for n in names)
        input_name = [n for n in names if n.startswith("plumed_input")][0]
        text = zf.read(input_name).decode()
    assert "PYTORCH_MODEL" in text


def test_loaded_linear_model_writes_unbiased_plumed(cv_dataset, tmp_path):
    """A model loaded from zip has no bias config and no in-memory cv_stats;
    write_plumed_files must still emit the unbiased input (the reference
    errors out on this path)."""
    from deep_cartograph_tpu.cv.base import CVCalculator

    _train("pca", cv_dataset, tmp_path)
    model_zip = os.path.join(str(tmp_path), "pca", "model.zip")
    loaded = CVCalculator.load(model_zip, os.path.join(str(tmp_path), "reload"))

    assert "min" in loaded.cv_stats and "max" in loaded.cv_stats
    plumed_dir = os.path.join(str(tmp_path), "plumed_loaded")
    os.makedirs(plumed_dir)
    loaded.write_plumed_files(cv_dataset["topology"], plumed_dir)
    assert sorted(os.listdir(plumed_dir)) == ["plumed_pca_unbiased.zip"]


def test_atom_sensitivity_aggregation(cv_dataset, tmp_path):
    """Per-atom sensitivity = max over features touching the atom
    (reference cv_calculator.py:691-723); outputs land in
    sensitivity_analysis/ as csv + B-factor pdb + plot."""
    calc, _ = _train("pca", cv_dataset, tmp_path)

    labels = ["dist-@CA_1-@CA_5", "dist-@CA_1-@CA_9"]
    per_atom = calc.compute_atom_sensitivities(
        labels, np.asarray([0.3, 0.8], np.float32)
    )
    # atom CA_1 touched by both features -> max; 5 and 9 get their own
    top_idx = {}
    from deep_cartograph_tpu.io.topology import Topology

    top = Topology.from_file(calc.ref_topology_path)
    for resid in (1, 5, 9):
        top_idx[resid] = int(top.atom_index("CA", resid))
    assert per_atom[top_idx[1]] == pytest.approx(0.8)
    assert per_atom[top_idx[5]] == pytest.approx(0.3)
    assert per_atom[top_idx[9]] == pytest.approx(0.8)

    sens_dir = os.path.join(
        str(tmp_path), "pca", "sensitivity_analysis", "sensitivity_analysis_1"
    )
    assert os.path.exists(os.path.join(sens_dir, "sensitivity_analysis.csv"))
    assert os.path.exists(os.path.join(sens_dir, "sensitivity_structure.pdb"))


def test_deep_cv_multi_try_ensemble(cv_dataset, tmp_path, monkeypatch):
    """num_tries > 1 routes through the batched (vmapped) multi-try trainer
    and still produces a valid deployed model + per-try checkpoints."""
    from deep_cartograph_tpu.cv import deep as deep_mod

    calls = []
    orig = deep_mod.NonLinear._run_tries_ensemble

    def spy(self, *args, **kwargs):
        out = orig(self, *args, **kwargs)
        calls.append(len(out))
        return out

    monkeypatch.setattr(deep_mod.NonLinear, "_run_tries_ensemble", spy)

    cfg = base_config()
    cfg["training"]["general"]["num_tries"] = 3
    cfg["training"]["general"]["max_epochs"] = 20
    calc, projection = _train("ae", cv_dataset, tmp_path, config=cfg)
    assert projection is not None and projection.shape[0] == 400
    assert calls == [3]  # the ensemble path ran once, returning all 3 tries
    # one checkpoint folder per try
    ckpt_root = os.path.join(str(tmp_path), "ae", "training", "checkpoints")
    tries = sorted(os.listdir(ckpt_root))
    assert tries == ["try_1", "try_2", "try_3"]
    for t in tries:
        assert os.path.exists(os.path.join(ckpt_root, t, "score.txt"))


def test_orbax_checkpoint_mirror_restores(cv_dataset, tmp_path):
    """The per-try orbax mirror (sharding-aware restore format for pod runs)
    restores parameters identical to the msgpack checkpoint."""
    import flax.serialization
    import jax

    orbax = pytest.importorskip("orbax.checkpoint")

    cfg = base_config()
    cfg["training"]["general"]["num_tries"] = 1
    cfg["training"]["general"]["max_epochs"] = 10
    _train("ae", cv_dataset, tmp_path, config=cfg)

    folder = os.path.join(str(tmp_path), "ae", "training", "checkpoints",
                          "try_1")
    orbax_dir = os.path.join(folder, "orbax")
    assert os.path.isdir(orbax_dir)

    with orbax.StandardCheckpointer() as ckpt:
        restored = ckpt.restore(os.path.abspath(orbax_dir))
    with open(os.path.join(folder, "model.msgpack"), "rb") as fh:
        from_msgpack = flax.serialization.from_bytes(restored, fh.read())

    flat_r = jax.tree.leaves(restored)
    flat_m = jax.tree.leaves(from_msgpack)
    assert len(flat_r) == len(flat_m) > 0
    for a, b in zip(flat_r, flat_m):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_batchnorm_folds_into_dense_for_eval(cv_dataset, tmp_path):
    """Batchnorm trains on batch statistics but the DEPLOYED model folds
    training-set statistics into the dense weights: projections are
    batch-composition independent, sensitivities are non-zero, and the
    TorchScript twin matches exactly (round-2 advisor findings)."""
    import torch
    import zipfile

    cfg = base_config()
    cfg["architecture"]["encoder"]["batchnorm"] = [True]
    cfg["architecture"]["decoder"]["batchnorm"] = [True]
    cfg["training"]["general"]["max_epochs"] = 15
    calc, projection = _train("ae", cv_dataset, tmp_path, cfg)
    assert projection is not None

    # architecture saved without batchnorm; params are dense-only
    assert not any(calc.architecture["encoder_options"]["batchnorm"])
    assert not any(
        k.startswith("bn_") for k in calc.params["encoder"].keys()
    )

    # projection independent of inference batch composition
    data = cv_dataset["data"]
    whole = calc.project_data(data)
    parts = np.concatenate(
        [calc.project_data(data[:37]), calc.project_data(data[37:])]
    )
    np.testing.assert_allclose(whole, parts, atol=1e-5)

    # sensitivity Jacobians are not identically zero (the stateless-BN
    # per-sample forward gave exactly-zero Jacobians before the fold)
    found = False
    for root, _, files in os.walk(os.path.join(str(tmp_path), "ae")):
        for f in files:
            if f == "sensitivity_analysis.csv":
                import pandas as pd

                vals = pd.read_csv(os.path.join(root, f)).iloc[:, 1]
                found = True
                assert np.abs(vals.to_numpy()).max() > 0
    assert found, "no sensitivity_analysis.csv written"

    # TorchScript twin agrees (the folded model is a plain MLP)
    model_zip = os.path.join(str(tmp_path), "ae", "model.zip")
    with zipfile.ZipFile(model_zip) as zf:
        zf.extract("model/cv_weights.pt", str(tmp_path / "ts"))
    ts = torch.jit.load(str(tmp_path / "ts" / "model" / "cv_weights.pt"))
    with torch.no_grad():
        out = ts(torch.from_numpy(data)).numpy()
    np.testing.assert_allclose(out, projection.to_numpy(), atol=2e-4)


def test_export_rejects_unfolded_batchnorm():
    """A legacy architecture still carrying active batchnorm flags must not
    export silently (the Linear+activation twin would drop the BN)."""
    import pytest as _pytest

    from deep_cartograph_tpu.models.torch_export import build_torch_cv

    arch = {
        "kind": "deep_tica",
        "layers": [4, 8, 2],
        "encoder_options": {
            "activation": ["tanh", None],
            "batchnorm": [True, False],
        },
        "norm_mean": None,
        "norm_range": None,
        "tica_evecs": None,
        "post_mean": None,
        "post_range": None,
    }
    with _pytest.raises(ValueError, match="batchnorm"):
        build_torch_cv(arch, {"nn": {}})


def test_deep_tica_validation_pairs_respect_file_boundaries(
    cv_dataset, tmp_path
):
    """Validation lag pairs never straddle trajectory-file boundaries
    (mirrors the training path's per-label blocks)."""
    from deep_cartograph_tpu.cv.deep import DeepTICACalculator

    cfg = base_config()
    cfg["lag_time"] = 3
    calc = DeepTICACalculator(
        configuration=cfg, output_path=str(tmp_path)
    )
    calc.load_training_data(
        [cv_dataset["colvars"]],
        [cv_dataset["topology"]],
        features_list=cv_dataset["labels"],
    )
    # two validation "files" (reuse the same colvars file twice)
    calc.load_validation_data(
        [cv_dataset["colvars"], cv_dataset["colvars"]],
        features_list=cv_dataset["labels"],
    )
    n = cv_dataset["data"].shape[0]
    per_file = calc.x_t.shape[0]  # pairs from ONE file at this lag
    assert calc.val_x_t.shape[0] == 2 * per_file


def test_train_colvars_per_cv_restart(cv_dataset, tmp_path):
    """A crash between CVs doesn't retrain the completed ones: a CV with
    an existing model + projections is skipped on rerun (reference
    per-CV restart semantics), while missing CVs are (re)trained."""
    from deep_cartograph_tpu.tools.train_colvars import train_colvars

    cfg = {
        "cvs": ["pca", "tica"],
        "common": {
            "dimension": 2,
            "lag_time": 2,
            "features_normalization": "mean_std",
            "input_colvars": {"start": 0, "stop": None, "stride": 1},
        },
    }
    out = str(tmp_path / "tc")
    train_colvars(
        configuration=cfg,
        train_colvars_paths=[cv_dataset["colvars"]],
        train_topologies=[cv_dataset["topology"]],
        trajectory_names=["traj"],
        features_list=cv_dataset["labels"],
        output_folder=out,
    )
    pca_zip = os.path.join(out, "pca", "model.zip")
    tica_zip = os.path.join(out, "tica", "model.zip")
    assert os.path.exists(pca_zip) and os.path.exists(tica_zip)

    # simulate a crash after pca: remove tica, keep pca
    import shutil

    shutil.rmtree(os.path.join(out, "tica"))
    pca_mtime = os.path.getmtime(pca_zip)
    train_colvars(
        configuration=cfg,
        train_colvars_paths=[cv_dataset["colvars"]],
        train_topologies=[cv_dataset["topology"]],
        trajectory_names=["traj"],
        features_list=cv_dataset["labels"],
        output_folder=out,
    )
    assert os.path.exists(tica_zip)               # retrained
    assert os.path.getmtime(pca_zip) == pca_mtime  # untouched


@pytest.fixture(scope="module")
def htica_two_file_dataset(tmp_path_factory):
    """Two colvars files (distinct slow signals) for the streaming path."""
    root = tmp_path_factory.mktemp("htica_stream_data")
    rng = np.random.default_rng(11)
    labels = [f"dist-@CA_1-@CA_{i + 2}" for i in range(6)]
    paths = []
    for fi in range(2):
        n = 300 + 60 * fi
        drift = np.cumsum(rng.standard_normal(n)).astype(np.float32) / 8
        data = rng.standard_normal((n, 6)).astype(np.float32) * 0.1
        data[:, 0] += drift
        data[:, 3] += 0.5 * drift
        data += 1.0 + fi * 0.2
        time_col = np.arange(n, dtype=np.float32)
        p = os.path.join(str(root), f"cv_{fi}.dat")
        write_colvars(
            p, np.column_stack([time_col, data]), ["time"] + labels,
            fmt="%.6f",
        )
        paths.append(p)
    return {"paths": paths, "labels": labels}


def test_htica_streaming_matches_in_memory(htica_two_file_dataset, tmp_path):
    """The shipped HTICACalculator's streaming mode (bounded-memory
    iter_features_chunks -> StreamingHTICA, for matrices too large for
    host RAM) reproduces the in-memory calculator on the same two-file
    dataset: same eigenvalues, same projections, same per-file lag-pair
    boundaries (no pairs across files)."""
    from deep_cartograph_tpu.cv import cv_calculators_map
    from deep_cartograph_tpu.io.colvars import clear_memory_cache

    ds = htica_two_file_dataset
    cfg = base_config(lag_time=3)

    mem = cv_calculators_map["htica"](
        configuration=cfg, output_path=os.path.join(str(tmp_path), "mem")
    )
    mem.load_training_data(ds["paths"], features_list=ds["labels"])
    assert not mem._streaming  # matrix is tiny; auto stays in-memory
    proj_mem = mem.run()

    clear_memory_cache()  # force the streaming reader's file-parse path
    stream_cfg = dict(cfg, streaming=True)
    st = cv_calculators_map["htica"](
        configuration=stream_cfg,
        output_path=os.path.join(str(tmp_path), "stream"),
    )
    st.load_training_data(ds["paths"], features_list=ds["labels"])
    assert st._streaming
    assert st.training_data is None  # nothing materialized
    proj_st = st.run()

    np.testing.assert_allclose(
        st.eigenvalues_, mem.eigenvalues_, atol=1e-4
    )
    np.testing.assert_allclose(
        np.abs(proj_st.to_numpy()), np.abs(proj_mem.to_numpy()), atol=2e-3
    )
    np.testing.assert_allclose(
        st.features_norm_mean, mem.features_norm_mean, atol=1e-5
    )

    # model.zip round trip from the streaming-trained model
    from deep_cartograph_tpu.cv.base import CVCalculator

    model_zip = os.path.join(str(tmp_path), "stream", "htica", "model.zip")
    assert os.path.exists(model_zip)
    loaded = CVCalculator.load(
        model_zip, os.path.join(str(tmp_path), "reload")
    )
    reprojected = loaded.project_colvars(ds["paths"], None)
    np.testing.assert_allclose(
        reprojected.to_numpy(), proj_st.to_numpy(), atol=2e-4
    )


def test_htica_streaming_uneven_subspaces(htica_two_file_dataset, tmp_path):
    """Streaming with num_subspaces not dividing num_features pads the
    feature axis internally; weights come back at the true width."""
    from deep_cartograph_tpu.cv import cv_calculators_map

    ds = htica_two_file_dataset
    cfg = dict(base_config(lag_time=2), streaming=True, num_subspaces=4,
               subspaces_dimension=1)
    st = cv_calculators_map["htica"](
        configuration=cfg, output_path=str(tmp_path)
    )
    st.load_training_data(ds["paths"], features_list=ds["labels"])
    proj = st.run()
    assert st.cv.shape == (6, 2)
    assert proj.shape[1] == 2
    assert np.isfinite(proj.to_numpy()).all()
    assert st.eigenvalues_[0] <= 1.0 + 1e-5


@pytest.mark.parametrize("cv_name", ["pca", "tica"])
def test_linear_streaming_matches_in_memory(
    htica_two_file_dataset, tmp_path, cv_name
):
    """PCA and TICA also stream larger-than-RAM training sets through the
    shipped calculators (streaming covariances; TICA = one-subspace
    StreamingHTICA), matching the in-memory result."""
    from deep_cartograph_tpu.cv import cv_calculators_map
    from deep_cartograph_tpu.io.colvars import clear_memory_cache

    ds = htica_two_file_dataset
    cfg = base_config(lag_time=2)

    mem = cv_calculators_map[cv_name](
        configuration=cfg, output_path=os.path.join(str(tmp_path), "mem")
    )
    mem.load_training_data(ds["paths"], features_list=ds["labels"])
    assert not mem._streaming
    proj_mem = mem.run()

    clear_memory_cache()
    st = cv_calculators_map[cv_name](
        configuration=dict(cfg, streaming=True),
        output_path=os.path.join(str(tmp_path), "stream"),
    )
    st.load_training_data(ds["paths"], features_list=ds["labels"])
    assert st._streaming and st.training_data is None
    proj_st = st.run()

    np.testing.assert_allclose(
        np.abs(proj_st.to_numpy()), np.abs(proj_mem.to_numpy()), atol=2e-3
    )
    if cv_name == "tica":
        np.testing.assert_allclose(
            st.eigenvalues_, mem.eigenvalues_, atol=1e-4
        )
    else:
        np.testing.assert_allclose(
            st.explained_variance_, mem.explained_variance_, rtol=1e-3
        )


def test_streaming_with_identity_topology(htica_two_file_dataset, tmp_path):
    """streaming=true with a single topology equal to the reference must
    STREAM, not silently fall back: translation is identity there (round-5
    fix; the tool passes train_topologies for every real trajectory, so the
    old any-topology fallback disabled streaming on exactly the
    single-system >RAM runs it was built for)."""
    from deep_cartograph_tpu.cv import cv_calculators_map
    from deep_cartograph_tpu.io.colvars import clear_memory_cache
    from tests.fixtures import make_ca_coords, write_ca_pdb

    ds = htica_two_file_dataset
    pdb = os.path.join(str(tmp_path), "top.pdb")
    write_ca_pdb(pdb, make_ca_coords(8, 1, seed=0)[0])

    clear_memory_cache()
    st = cv_calculators_map["tica"](
        configuration=dict(base_config(lag_time=2), streaming=True),
        output_path=os.path.join(str(tmp_path), "stream"),
    )
    st.load_training_data(
        ds["paths"],
        train_topology_paths=[pdb, pdb],
        ref_topology_path=pdb,
        features_list=ds["labels"],
    )
    assert st._streaming and st.training_data is None
    assert st.ref_topology_path == pdb  # PLUMED export still has its ref
    proj_st = st.run()

    mem = cv_calculators_map["tica"](
        configuration=base_config(lag_time=2),
        output_path=os.path.join(str(tmp_path), "mem"),
    )
    mem.load_training_data(
        ds["paths"],
        train_topology_paths=[pdb, pdb],
        ref_topology_path=pdb,
        features_list=ds["labels"],
    )
    assert not mem._streaming
    proj_mem = mem.run()
    np.testing.assert_allclose(
        np.abs(proj_st.to_numpy()), np.abs(proj_mem.to_numpy()), atol=2e-3
    )

    # distinct topologies: real translation, streaming correctly refuses
    pdb2 = os.path.join(str(tmp_path), "top2.pdb")
    write_ca_pdb(pdb2, make_ca_coords(8, 1, seed=1)[0])
    fb = cv_calculators_map["tica"](
        configuration=dict(base_config(lag_time=2), streaming=True),
        output_path=os.path.join(str(tmp_path), "fallback"),
    )
    fb.load_training_data(
        ds["paths"],
        train_topology_paths=[pdb, pdb2],
        ref_topology_path=pdb,
        features_list=ds["labels"],
    )
    assert not fb._streaming


def test_htica_streaming_sharded_over_mesh(tmp_path, rng):
    """On a multi-device mesh, the tool's streaming HTICA shards the
    subspace axis automatically (8 subspaces over 8 CPU devices here) and
    matches the unsharded streaming result."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("single device")
    from deep_cartograph_tpu.cv import cv_calculators_map

    n, f = 500, 16
    labels = [f"dist-@CA_1-@CA_{i + 2}" for i in range(f)]
    data = rng.standard_normal((n, f)).astype(np.float32)
    data = (np.cumsum(data, axis=0) / 10 + data).astype(np.float32)
    path = os.path.join(str(tmp_path), "wide.dat")
    write_colvars(
        path, np.column_stack([np.arange(n, dtype=np.float32), data]),
        ["time"] + labels, fmt="%.6f",
    )

    n_dev = len(jax.devices())
    cfg = dict(
        base_config(lag_time=4), streaming=True,
        num_subspaces=n_dev, subspaces_dimension=2,
    )
    sharded = cv_calculators_map["htica"](
        configuration=cfg, output_path=os.path.join(str(tmp_path), "sh")
    )
    sharded.load_training_data([path], features_list=labels)
    proj_sh = sharded.run()

    # unsharded comparison: same config, mesh disabled by an
    # indivisible subspace count? no — force single-device by patching
    # devices is brittle; instead compare against the in-memory result.
    mem = cv_calculators_map["htica"](
        configuration={**cfg, "streaming": False},
        output_path=os.path.join(str(tmp_path), "mem"),
    )
    mem.load_training_data([path], features_list=labels)
    proj_mem = mem.run()

    np.testing.assert_allclose(
        sharded.eigenvalues_, mem.eigenvalues_, atol=1e-4
    )
    np.testing.assert_allclose(
        np.abs(proj_sh.to_numpy()), np.abs(proj_mem.to_numpy()), atol=2e-3
    )


def test_streaming_labels_nan_and_guards(htica_two_file_dataset, tmp_path, rng):
    """Streaming-mode invariants fixed by review: per-file
    training_data_labels (the tool's per-trajectory outputs depend on
    them), the in-memory loader's NaN screen, the schema carries the
    documented `streaming` key, and misconfigurations fail gracefully."""
    from deep_cartograph_tpu.config.schemas import CommonCollectiveVariable
    from deep_cartograph_tpu.cv import cv_calculators_map
    from deep_cartograph_tpu.io.colvars import write_colvars as _wc

    ds = htica_two_file_dataset
    cfg = dict(base_config(lag_time=2), streaming=True)

    # per-file labels: 300 rows of file 0, 360 of file 1
    st = cv_calculators_map["htica"](
        configuration=cfg, output_path=os.path.join(str(tmp_path), "lab")
    )
    st.load_training_data(ds["paths"], features_list=ds["labels"])
    labels = st.training_data_labels
    assert labels is not None and labels.shape == (660,)
    assert (labels[:300] == 0).all() and (labels[300:] == 1).all()

    # the documented config key survives pydantic validation
    assert CommonCollectiveVariable(streaming=True).model_dump()[
        "streaming"
    ] is True
    assert CommonCollectiveVariable().model_dump()["streaming"] == "auto"

    # NaN screen matches the in-memory loader's hard failure
    bad = rng.standard_normal((50, 2)).astype(np.float32)
    bad[17, 1] = np.nan
    bad_path = os.path.join(str(tmp_path), "bad.dat")
    _wc(bad_path, bad, ["time", "dist-@CA_1-@CA_2"], fmt="%.6f")
    nan_calc = cv_calculators_map["tica"](
        configuration=cfg, output_path=os.path.join(str(tmp_path), "nan")
    )
    with pytest.raises(ValueError, match="Clean your data"):
        nan_calc.load_training_data([bad_path])

    # zero feature columns: clean error, not ZeroDivisionError
    empty_path = os.path.join(str(tmp_path), "timeonly.dat")
    _wc(empty_path, np.arange(10, dtype=np.float32)[:, None], ["time"])
    empty_calc = cv_calculators_map["pca"](
        configuration=cfg, output_path=os.path.join(str(tmp_path), "empty")
    )
    with pytest.raises(ValueError, match="No feature columns"):
        empty_calc.load_training_data([empty_path])

    # num_subspaces missing/invalid: graceful (logged) failure, no raise
    ns_calc = cv_calculators_map["htica"](
        configuration=dict(cfg, num_subspaces=None),
        output_path=os.path.join(str(tmp_path), "ns"),
    )
    ns_calc.load_training_data(ds["paths"], features_list=ds["labels"])
    assert ns_calc.run() is None


def test_pca_streaming_raw_features_no_normalization(tmp_path, rng):
    """Streaming PCA with features_normalization: None (the schema
    default) on mean-dominated raw features matches the in-memory result
    — the first-block shift keeps the f32 device product O(variance)."""
    from deep_cartograph_tpu.cv import cv_calculators_map
    from deep_cartograph_tpu.io.colvars import (
        clear_memory_cache,
        write_colvars as _wc,
    )

    n, f = 600, 5
    labels = [f"dist-@CA_1-@CA_{i + 2}" for i in range(f)]
    data = (rng.standard_normal((n, f)) * 0.05).astype(np.float32)
    data += np.asarray([50.0, 30.0, 80.0, 20.0, 60.0], np.float32)
    path = os.path.join(str(tmp_path), "raw.dat")
    _wc(path, np.column_stack([np.arange(n, dtype=np.float32), data]),
        ["time"] + labels, fmt="%.6f")

    cfg = dict(base_config(), features_normalization=None)
    mem = cv_calculators_map["pca"](
        configuration=cfg, output_path=os.path.join(str(tmp_path), "mem")
    )
    mem.load_training_data([path], features_list=labels)
    proj_mem = mem.run()

    clear_memory_cache()
    st = cv_calculators_map["pca"](
        configuration=dict(cfg, streaming=True),
        output_path=os.path.join(str(tmp_path), "st"),
    )
    st.load_training_data([path], features_list=labels)
    proj_st = st.run()

    np.testing.assert_allclose(
        st.explained_variance_, mem.explained_variance_, rtol=1e-2
    )
    np.testing.assert_allclose(
        np.abs(proj_st.to_numpy()), np.abs(proj_mem.to_numpy()), atol=5e-3
    )


def test_train_colvars_tool_streaming_end_to_end(
    htica_two_file_dataset, tmp_path
):
    """The SHIPPED train_colvars tool path with streaming on (config key
    through the pydantic schema): model.zip lands, and the per-trajectory
    projected CSVs are non-empty for BOTH files (requires streaming-mode
    training_data_labels)."""
    import pandas as pd

    from deep_cartograph_tpu.tools.train_colvars import train_colvars
    from deep_cartograph_tpu.config.schemas import TrainColvarsSchema

    ds = htica_two_file_dataset
    cfg = TrainColvarsSchema(
        cvs=["htica"],
        common={
            "dimension": 2,
            "lag_time": 2,
            "features_normalization": "mean_std",
            "num_subspaces": 2,
            "subspaces_dimension": 2,
            "streaming": True,
        },
    ).model_dump()
    assert cfg["common"]["streaming"] is True  # survives validation

    out = str(tmp_path / "tc_stream")
    train_colvars(
        configuration=cfg,
        train_colvars_paths=ds["paths"],
        trajectory_names=["trajA", "trajB"],
        features_list=ds["labels"],
        output_folder=out,
    )
    assert os.path.exists(os.path.join(out, "htica", "model.zip"))
    for name, rows in (("trajA", 300), ("trajB", 360)):
        csvs = []
        for root, _, files in os.walk(os.path.join(out, "htica")):
            csvs += [
                os.path.join(root, f) for f in files
                if f.endswith(".csv") and name in root
            ]
        proj = [p for p in csvs if "project" in os.path.basename(p).lower()]
        assert proj, f"no projected csv for {name}: {csvs}"
        df = pd.read_csv(proj[0])
        assert len(df) == rows, (proj[0], len(df))


def test_project_colvars_streaming_matches(
    htica_two_file_dataset, tmp_path, monkeypatch
):
    """Block-streamed projection (forced via a tiny DEEP_CARTO_STREAM_BYTES)
    returns exactly the in-memory project_colvars result, including
    per-file projection_data_labels."""
    from deep_cartograph_tpu.cv import cv_calculators_map

    ds = htica_two_file_dataset
    calc = cv_calculators_map["tica"](
        configuration=base_config(lag_time=2),
        output_path=str(tmp_path),
    )
    calc.load_training_data(ds["paths"], features_list=ds["labels"])
    calc.run()

    ref = calc.project_colvars(ds["paths"], None)
    ref_labels = calc.projection_data_labels.copy()

    monkeypatch.setenv("DEEP_CARTO_STREAM_BYTES", "1")
    st = calc.project_colvars(ds["paths"], None)
    np.testing.assert_allclose(
        st.to_numpy(), ref.to_numpy(), atol=1e-5
    )
    np.testing.assert_array_equal(calc.projection_data_labels, ref_labels)

    # NaN screen parity with the in-memory loader
    from deep_cartograph_tpu.io.colvars import write_colvars as _wc

    bad = np.full((20, 7), 0.5, np.float32)
    bad[3, 4] = np.nan
    bad_path = os.path.join(str(tmp_path), "badproj.dat")
    _wc(bad_path, bad, ["time"] + ds["labels"], fmt="%.6f")
    with pytest.raises(ValueError, match="Clean your data"):
        calc.project_colvars([bad_path], None)
