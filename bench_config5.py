"""BASELINE config 5 through the SHIPPED pipeline code: 100k frames x 50k
features — featurize (compile_plan/PlanEvaluator) -> filter stats (std +
entropy screens, streamed) -> StreamingHTICA (full 50k) -> deep-TICA fit on
the filtered set (Trainer.fit_ensemble, the shipped deep-CV path) -> device
KMeans + scores on the CV trajectory. Per-stage wall-clock recorded.

The 20 GB fp32 feature matrix never exists at once: frames are generated on
device in blocks and featurized by the same PlanEvaluator program the tools
use (bench.py covers the host-decode/upload side at config-2 shape; one
upload-inclusive probe block is timed here for honesty). StreamingHTICA
accumulates per-subspace time-lagged covariances in two passes.

Writes BENCH_config5.json. Run: python bench_config5.py  (single chip).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

N_FRAMES = int(os.environ.get("CFG5_FRAMES", 100_000))
N_ATOMS = int(os.environ.get("CFG5_ATOMS", 320))
N_FEATURES = int(os.environ.get("CFG5_FEATURES", 50_000))
BLOCK = int(os.environ.get("CFG5_BLOCK", 2_500))
NUM_SUBSPACES = int(os.environ.get("CFG5_SUBSPACES", 50))
SUB_OUT = 5
CV_DIM = 2
LAG = 10
STD_QUANTILE = 0.5
# deep-TICA input width: top-K features by std
DEEP_K = int(os.environ.get("CFG5_DEEP_K", 4096))
EPOCHS = 5
BATCH = int(os.environ.get("CFG5_BATCH", 4096))
N_CLUSTERS = 4


def _log(msg: str) -> None:
    print(f"[config5] {msg}", file=sys.stderr, flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from deep_cartograph_tpu.cluster.clustering import (
        clustering_scores,
        kmeans_clustering,
    )
    from deep_cartograph_tpu.cv.deep import make_deep_tica_loss
    from deep_cartograph_tpu.cv.htica_stream import StreamingHTICA
    from deep_cartograph_tpu.features.grammar import compile_plan
    from deep_cartograph_tpu.geom.kernels import PlanEvaluator
    from deep_cartograph_tpu.io.topology import Topology
    from deep_cartograph_tpu.models.networks import DeepTICANet
    from deep_cartograph_tpu.models.training import Trainer, TrainerConfig
    from deep_cartograph_tpu.utils.demo_data import write_ca_pdb

    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    stages = {}

    # ---- stage 0: topology + 50k-label plan through the shipped grammar --
    t = np.linspace(0, 6 * np.pi, N_ATOMS)
    base = np.stack([3.0 * np.cos(t), 3.0 * np.sin(t), 1.0 * t], 1).astype(
        np.float32
    )
    tmpdir = tempfile.mkdtemp(prefix="cfg5_")
    pdb_path = os.path.join(tmpdir, "top.pdb")
    write_ca_pdb(pdb_path, base)
    top = Topology.from_pdb(pdb_path)

    ii, jj = np.triu_indices(N_ATOMS, k=2)
    ii, jj = ii[:N_FEATURES], jj[:N_FEATURES]
    labels = [f"dist-@CA_{a + 1}-@CA_{b + 1}" for a, b in zip(ii, jj)]
    t0 = time.time()
    plan = compile_plan(labels, top)
    plan_host_s = time.time() - t0
    assert plan.n_features == N_FEATURES
    _log(f"plan compile (host, 50k labels) {plan_host_s:.1f}s")

    evaluator = PlanEvaluator(plan)

    # ---- on-device trajectory generator (collective modes + noise) ------
    n_modes = 10
    phases = jnp.asarray(rng.uniform(0, 2 * np.pi, n_modes).astype(np.float32))
    freqs = jnp.asarray(rng.uniform(0.5, 3.0, n_modes).astype(np.float32))
    shapes = jnp.asarray(
        (rng.standard_normal((n_modes, N_ATOMS, 3)) * 0.2).astype(np.float32)
    )
    base_d = jnp.asarray(base)
    base_key = jax.random.PRNGKey(7)

    @jax.jit
    def gen_coords(frame_ids):
        tt = frame_ids.astype(jnp.float32) / N_FRAMES * 2 * jnp.pi
        waves = jnp.sin(freqs[None, :] * tt[:, None] + phases[None, :])
        coords = base_d[None] + jnp.einsum("fm,mad->fad", waves, shapes)
        key = jax.random.fold_in(base_key, frame_ids[0])
        return coords + 0.05 * jax.random.normal(
            key, coords.shape, jnp.float32
        )

    def feat_block(start: int):
        ids = jnp.arange(start, start + BLOCK)
        return evaluator.eval_raw(gen_coords(ids))

    def block_iter():
        for start in range(0, N_FRAMES, BLOCK):
            yield feat_block(start)

    # Device program compile (first call through the shipped evaluator).
    t0 = time.time()
    first = feat_block(0)
    float(jnp.ravel(first)[0])
    stages["featurize_compile_s"] = round(time.time() - t0, 2)
    _log(f"featurize compile+first block {stages['featurize_compile_s']}s")

    # One upload-inclusive probe: host coords -> device -> features (the
    # decode/upload data path bench.py times at config-2 shape).
    host_block = np.asarray(gen_coords(jnp.arange(BLOCK)))
    t0 = time.time()
    probe = evaluator.eval_raw(jax.device_put(host_block))
    float(jnp.ravel(probe)[0])
    stages["upload_featurize_block_s"] = round(time.time() - t0, 3)
    del probe, host_block

    # ---- stage 1: filter stats, streamed (features.filter semantics) ----
    # Pass A: per-feature moments + range; pass B: 100-bin entropy counts
    # (the scatter-free scan formulation of stats/descriptors).
    @jax.jit
    def moments_acc(state, x):
        s, s2, mn, mx = state
        return (
            s + jnp.sum(x, 0),
            s2 + jnp.sum(x * x, 0),
            jnp.minimum(mn, jnp.min(x, 0)),
            jnp.maximum(mx, jnp.max(x, 0)),
        )

    t0 = time.time()
    state = (
        jnp.zeros(N_FEATURES, jnp.float32),
        jnp.zeros(N_FEATURES, jnp.float32),
        jnp.full(N_FEATURES, np.inf, jnp.float32),
        jnp.full(N_FEATURES, -np.inf, jnp.float32),
    )
    for blk in block_iter():
        state = moments_acc(state, blk)
    s, s2, mn, mx = state
    mean = s / N_FRAMES
    std = jnp.sqrt(jnp.maximum(s2 / N_FRAMES - mean * mean, 0.0))
    std_h = np.asarray(std)
    stages["filter_pass_moments_s"] = round(time.time() - t0, 2)

    @jax.jit
    def entropy_counts_acc(counts, x, mn, mx):
        # counts: (100, F). Bin each value, accumulate per-bin counts with
        # a scan over bins (scatter-free; matches stats/descriptors).
        span = jnp.maximum(mx - mn, 1e-12)
        idx = jnp.clip(((x - mn) / span) * 100, 0, 99).astype(jnp.int32)

        def body(c, b):
            return c.at[b].add(jnp.sum((idx == b).astype(jnp.float32), 0)), 0

        counts, _ = jax.lax.scan(body, counts, jnp.arange(100))
        return counts

    t0 = time.time()
    counts = jnp.zeros((100, N_FEATURES), jnp.float32)
    for blk in block_iter():
        counts = entropy_counts_acc(counts, blk, mn, mx)
    p = counts / N_FRAMES
    entropy = np.asarray(-jnp.sum(jnp.where(p > 0, p * jnp.log2(p), 0.0), 0))
    stages["filter_pass_entropy_s"] = round(time.time() - t0, 2)

    thr = np.quantile(std_h, STD_QUANTILE)
    keep = np.where(std_h >= thr)[0]
    n_filtered = int(keep.size)
    _log(
        f"filter: {n_filtered}/{N_FEATURES} past std screen "
        f"(entropy range {entropy.min():.2f}..{entropy.max():.2f})"
    )

    # ---- stage 2: StreamingHTICA at FULL 100k x 50k --------------------
    sh = StreamingHTICA(
        n_features=N_FEATURES,
        num_subspaces=NUM_SUBSPACES,
        subspaces_dimension=SUB_OUT,
        cv_dimension=CV_DIM,
        lag_time=LAG,
        reg=1e-6,
    )
    t0 = time.time()
    sh.fit(block_iter)
    stages["htica_fit_s"] = round(time.time() - t0, 2)
    _log(f"StreamingHTICA fit {stages['htica_fit_s']}s "
         f"(top eig {float(sh.eigenvalues_[0]):.4f})")

    # ---- stage 3: deep-TICA on the filtered set ------------------------
    # Production practice caps the CV input width; take the top-DEEP_K
    # features by std from the screen above and materialize the
    # (N_FRAMES, DEEP_K) matrix device-resident (2 GB fp32).
    top_k = np.argsort(std_h)[::-1][:DEEP_K].copy()
    top_k.sort()
    top_k_d = jnp.asarray(top_k.astype(np.int32))

    t0 = time.time()
    parts = [jnp.take(blk, top_k_d, axis=1) for blk in block_iter()]
    deep_x = jnp.concatenate(parts, axis=0)
    del parts
    mu = jnp.mean(deep_x, 0)
    sd = jnp.std(deep_x, 0) + 1e-8
    deep_x = (deep_x - mu) / sd
    x_t, x_lag = deep_x[:-LAG], deep_x[LAG:]
    float(jnp.ravel(x_lag)[0])
    stages["deep_input_materialize_s"] = round(time.time() - t0, 2)

    net = DeepTICANet(
        layers=(DEEP_K, 64, 64, CV_DIM),
        options={"activation": ["tanh", "tanh", None], "dropout": [],
                 "batchnorm": []},
    )
    params = net.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        jnp.zeros((2, DEEP_K), jnp.float32),
        train=False,
    )["params"]
    loss_fn = make_deep_tica_loss(net, 1e-5, CV_DIM)
    config = TrainerConfig(
        batch_size=BATCH,
        max_epochs=EPOCHS,
        shuffle=True,
        check_val_every_n_epoch=EPOCHS,
        save_check_every_n_epoch=EPOCHS,
        early_stop_patience=10 * EPOCHS,
        optimizer_name="Adam",
        optimizer_kwargs={"lr": 1e-3},
        model_to_save="last",
        device="default",
        ensemble_epoch_chunk=EPOCHS,
    )
    trainer = Trainer(loss_fn, config)
    full = {"data": x_t, "data_lag": x_lag}
    n_tot = int(x_t.shape[0])
    train_idx = np.arange(n_tot, dtype=np.int32)[None]
    valid_idx = np.arange(n_tot - BATCH, n_tot, dtype=np.int32)[None]
    params_stack = jax.tree.map(lambda a: a[None], params)
    t0 = time.time()
    result = trainer.fit_ensemble(
        params_stack, full, train_idx, valid_idx, [0]
    )[0]
    deep_loss = float(result.score)
    stages["deep_tica_train_s"] = round(time.time() - t0, 2)
    _log(f"deep-TICA {EPOCHS} epochs {stages['deep_tica_train_s']}s "
         f"(loss {deep_loss:.4f})")

    # ---- stage 4: cluster the CV trajectory ----------------------------
    t0 = time.time()
    cv_traj = net.apply({"params": result.params}, deep_x, train=False)
    assign, centers = kmeans_clustering(cv_traj, N_CLUSTERS, n_init=4)
    ch, db, sil = clustering_scores(np.asarray(cv_traj), np.asarray(assign))
    scores = {"calinski_harabasz": ch, "davies_bouldin": db,
              "silhouette": sil}
    stages["cluster_s"] = round(time.time() - t0, 2)
    _log(f"kmeans+scores {stages['cluster_s']}s (sizes "
         f"{np.bincount(np.asarray(assign)).tolist()})")

    total = sum(
        v for k, v in stages.items()
        if k not in ("featurize_compile_s", "upload_featurize_block_s")
    )
    mem = {}
    try:
        st = dev.memory_stats() or {}
        mem = {"hbm_peak_bytes": st.get("peak_bytes_in_use")}
    except Exception:
        pass
    if mem.get("hbm_peak_bytes") is None:
        sub_f = N_FEATURES // NUM_SUBSPACES
        mem["hbm_estimate_bytes"] = int(
            N_FRAMES * DEEP_K * 4                      # deep-TICA matrix
            + BLOCK * N_FEATURES * 4 * 2               # blocks in flight
            + NUM_SUBSPACES * sub_f * sub_f * 2 * 4    # HTICA accumulators
            + 100 * N_FEATURES * 4                     # entropy counts
        )

    result_json = {
        "metric": "config5_full_pipeline_100kx50k_wallclock",
        "value": round(total, 2),
        "unit": "s",
        "detail": {
            "device": str(dev),
            "n_frames": N_FRAMES,
            "n_features": N_FEATURES,
            "plan_compile_host_s": round(plan_host_s, 2),
            **stages,
            "n_filtered_std_screen": n_filtered,
            "deep_tica_input_features": DEEP_K,
            "deep_tica_epochs": EPOCHS,
            "deep_tica_loss": round(deep_loss, 4),
            "htica_top_eigenvalues": [
                round(float(v), 5) for v in sh.eigenvalues_
            ],
            "cluster_scores": {
                k: round(float(v), 4) for k, v in scores.items()
            },
            **mem,
            "notes": (
                "Every stage runs the shipped deep_cartograph_tpu code: "
                "compile_plan/PlanEvaluator featurization (fixed-shape "
                "subchunk programs), streamed std+entropy screens, "
                "StreamingHTICA two-pass covariances at full 50k width, "
                "Trainer.fit_ensemble deep-TICA on the top-4096 filtered "
                "features, device KMeans + validity scores on the CV "
                "trajectory. Frames are generated on device; bench.py "
                "measures the host-decode/upload path."
            ),
        },
    }
    print(json.dumps(result_json))
    with open("BENCH_config5.json", "w") as fh:
        json.dump(result_json, fh, indent=1)


if __name__ == "__main__":
    try:
        main()
    except Exception as exc:
        print(f"[config5] first attempt failed ({exc}); retrying once",
              file=sys.stderr, flush=True)
        time.sleep(10)
        main()
