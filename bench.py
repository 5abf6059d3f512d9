"""Benchmark: featurize + filter + train deep-TICA, END-TO-END through the
shipped framework code path (BASELINE.json north star: 100k frames x ~1k
features).

TPU pipeline (timed, host->device upload INCLUSIVE):
  DCD file on disk
    -> native prefetching decoder (native/dcdloader.cpp via
       io.dcd.iter_dcd_chunks_prefetch: decode thread overlaps device work)
    -> async jax.device_put per chunk (JAX async dispatch double-buffers
       the tunnel transfer against featurization)
    -> geom.kernels.PlanEvaluator (the shipped featurization engine:
       selector-matmul distances + dihedral sin/cos from a compiled plan)
    -> stats.descriptors entropy/std + quantile screen (features.filter
       semantics, device-resident)
    -> models.training.Trainer with the shipped DeepTICA loss
       (cv.deep.make_deep_tica_loss over models.networks.DeepTICANet).

Reference-style CPU baseline (measured on subsets, scaled linearly): the
reference's ACTUAL pipeline architecture including its inter-step text I/O
(SURVEY 3.2/3.4) — PLUMED-driver-style serial per-frame featurization, the
colvars ASCII write (fprintf-equivalent np.savetxt), pandas re-reads by the
filter and training steps (reference reads the file at least twice; the
filter's per-feature re-read design makes it far worse — reported in
detail), numpy filter statistics, and torch-CPU minibatch deep-TICA
training (mlcolvar/Lightning's stack without their framework overhead,
i.e. a LOWER bound for the reference).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": X, "detail": {...}}

vs_baseline = ref_style_cpu_total_s / tpu_total_s, both end-to-end,
upload-inclusive on the TPU side and text-I/O-inclusive on the CPU side.
detail carries every component, an XLA-on-host-CPU featurize mirror, and
MFU for the selector contraction.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

N_FRAMES = int(os.environ.get("BENCH_FRAMES", 100_000))
N_ATOMS = 48
CHUNK = int(os.environ.get("BENCH_CHUNK", 20_000))
EPOCHS = int(os.environ.get("BENCH_EPOCHS", 10))
BATCH = 4096
LAG = 10
STD_QUANTILE = 0.5  # keep features above the median std (both pipelines)
V5E_BF16_PEAK = 197e12  # TPU v5e peak bf16 FLOP/s (MFU denominator)
# Transport dtype for the timed featurize leg: int16 fixed point halves
# upload bytes over the link that dominates the leg (io/upload.py — the
# XTC 1e-3 A precision class the reference's own trajectory files use);
# float32 is exact. The artifact records the dtype and the realized
# max feature delta vs exact transport, asserted < 2.5e-2 (dihedral
# sin/cos amplify the coordinate step ~100x near degenerate quads; see
# the parity block below for the downstream-invariance evidence).
UPLOAD_DTYPE = os.environ.get("BENCH_UPLOAD_DTYPE", "int16")
if UPLOAD_DTYPE not in ("int16", "float32"):
    raise SystemExit(f"BENCH_UPLOAD_DTYPE must be int16|float32: {UPLOAD_DTYPE}")


def _log(msg: str) -> None:
    print(f"[bench] {msg}", file=sys.stderr, flush=True)
    # Every stage log re-stamps the chip-lock heartbeat: a holder that
    # stops logging (wedged in backend init) goes stale and waiters
    # fail fast with that diagnosis (bench_common round-5 contract).
    from bench_common import refresh_chip_heartbeat

    refresh_chip_heartbeat()


def _sync(x):
    """Force completion: pull one scalar to the host. jax.block_until_ready
    does not actually synchronize on tunneled backends (measured), so every
    timing below ends with a 4-byte host read instead."""
    import jax.numpy as jnp

    leaf = x
    while isinstance(leaf, (list, tuple)):
        leaf = leaf[-1]
    if isinstance(leaf, dict):
        leaf = next(iter(leaf.values()))
        while isinstance(leaf, (list, tuple)):
            leaf = leaf[-1]
    return float(jnp.ravel(jnp.asarray(leaf))[0])


# ---------------------------------------------------------------------------
# Synthetic CA trajectory (low-frequency collective modes + noise)
# ---------------------------------------------------------------------------

def make_trajectory(n_frames: int, n_atoms: int) -> np.ndarray:
    rng = np.random.default_rng(0)
    t = np.linspace(0, 4 * np.pi, n_atoms)
    base = np.stack([2.3 * np.cos(t), 2.3 * np.sin(t), 1.5 * t], 1).astype(
        np.float32
    )
    n_modes = 8
    phases = rng.uniform(0, 2 * np.pi, n_modes).astype(np.float32)
    freqs = rng.uniform(0.5, 3.0, n_modes).astype(np.float32)
    shapes = (rng.standard_normal((n_modes, n_atoms, 3)) * 0.3).astype(np.float32)
    tt = np.arange(n_frames, dtype=np.float32) / n_frames * 2 * np.pi
    waves = np.sin(freqs[None, :] * tt[:, None] + phases[None, :])
    return (base[None] + np.einsum("fm,mad->fad", waves, shapes)).astype(
        np.float32
    )


def make_labels(n_atoms: int):
    """All non-neighbor CA pair distances + sin/cos of consecutive virtual
    dihedrals — the feature families of the reference's default config."""
    labels = []
    for i in range(1, n_atoms + 1):
        for j in range(i + 2, n_atoms + 1):
            labels.append(f"dist-@CA_{i}-@CA_{j}")
    n_dihedrals = n_atoms - 3
    for i in range(1, n_dihedrals + 1):
        labels.append(f"sin-@CA_{i}-@CA_{i + 1}-@CA_{i + 2}-@CA_{i + 3}")
        labels.append(f"cos-@CA_{i}-@CA_{i + 1}-@CA_{i + 2}-@CA_{i + 3}")
    return labels


# ---------------------------------------------------------------------------
# Reference-style CPU components (all per-subset, scaled by the caller)
# ---------------------------------------------------------------------------

def _np_dihedrals(frame: np.ndarray, quads: np.ndarray) -> np.ndarray:
    b1 = frame[quads[:, 1]] - frame[quads[:, 0]]
    b2 = frame[quads[:, 2]] - frame[quads[:, 1]]
    b3 = frame[quads[:, 3]] - frame[quads[:, 2]]
    n1 = np.cross(b1, b2)
    n2 = np.cross(b2, b3)
    m1 = np.cross(n1, b2 / np.linalg.norm(b2, axis=1, keepdims=True))
    x = np.einsum("ij,ij->i", n1, n2)
    y = np.einsum("ij,ij->i", m1, n2)
    return np.arctan2(y, x)


def ref_serial_featurize(coords: np.ndarray, pairs, quads) -> float:
    """Serial per-frame loop — the PLUMED-driver execution model (one frame
    at a time through the feature list; reference cli.py:85-163). Vectorized
    within the frame, which PLUMED is not: a generous LOWER bound."""
    t0 = time.time()
    for f in range(coords.shape[0]):
        frame = coords[f]
        d = frame[pairs[:, 0]] - frame[pairs[:, 1]]
        _ = np.sqrt(np.einsum("pc,pc->p", d, d)) * 0.1
        phi = _np_dihedrals(frame, quads)
        _ = np.sin(phi)
        _ = np.cos(phi)
    return time.time() - t0


def ref_text_io_seconds(features_sub: np.ndarray, tmpdir: str):
    """(write_s, read_s) for the colvars ASCII round trip on a subset.
    Write: np.savetxt %.6f — the fprintf-per-value model of PLUMED's PRINT.
    Read: pandas.read_csv — the reference's actual colvars read path
    (modules/plumed/colvars.py uses pandas)."""
    import pandas as pd

    path = os.path.join(tmpdir, "colvars_subset.dat")
    t0 = time.time()
    np.savetxt(path, features_sub, fmt="%.6f")
    write_s = time.time() - t0
    t0 = time.time()
    pd.read_csv(path, sep=r"\s+", header=None)
    read_s = time.time() - t0
    return write_s, read_s


def ref_filter_stats_seconds(features: np.ndarray, n_probe: int = 100) -> float:
    """Numpy entropy (100-bin histogram, reference statistics.py:514-566)
    + std over a feature subset; caller scales to the full feature count."""
    sub = features[:, :n_probe]
    t0 = time.time()
    for j in range(sub.shape[1]):
        col = sub[:, j]
        counts, _ = np.histogram(col, bins=100)
        p = counts / max(len(col), 1)
        p = p[p > 0]
        _ = -np.sum(p * np.log2(p))
    _ = np.std(sub, axis=0)
    return time.time() - t0


def ref_measured_seconds(host_features: np.ndarray, io_sub: int, tmpdir: str):
    """Time the REFERENCE's own code (unmodified /root/reference checkout)
    in a subprocess: one read_colvars of an io_sub-frame full-width colvars
    file, plus Filter(...).run() on a FILTER_PROBE-feature probe file.
    Returns a dict of raw + scaled numbers (None on failure)."""
    import json
    import subprocess

    from deep_cartograph_tpu.io.colvars import write_colvars

    FILTER_PROBE = 24
    n_frames_total, n_feat = host_features.shape
    full_path = os.path.join(tmpdir, "ref_full.dat")
    probe_path = os.path.join(tmpdir, "ref_probe.dat")
    names = ["time"] + [f"dist-@CA_{j}-@CA_{j + 2}" for j in range(n_feat - 1)]
    write_colvars(full_path, host_features[:io_sub], names)
    write_colvars(
        probe_path, host_features[:io_sub, :FILTER_PROBE], names[:FILTER_PROBE]
    )
    runner = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "bench_ref_runner.py")
    try:
        proc = subprocess.run(
            [sys.executable, runner, full_path, probe_path,
             str(FILTER_PROBE - 1)],
            capture_output=True, text=True, timeout=1200,
        )
        raw = json.loads(proc.stdout.strip().splitlines()[-1])
    except Exception as exc:  # reference code unavailable: report, don't fail
        print(f"[bench] reference-code measurement skipped: {exc}")
        return None
    frames_scale = n_frames_total / io_sub
    feat_scale = n_feat / (FILTER_PROBE - 1)
    return {
        "ref_measured_read_s": round(raw["read_s"] * frames_scale, 2),
        "ref_measured_read_raw_s": round(raw["read_s"], 3),
        "ref_measured_filter_probe_s": round(raw["filter_s"], 2),
        "ref_measured_filter_full_estimate_s": round(
            raw["filter_s"] * feat_scale**2 * frames_scale, 1
        ),
        "ref_measured_probe_features": FILTER_PROBE - 1,
        "ref_measured_subset_frames": io_sub,
    }


def ref_torch_epoch_seconds(features: np.ndarray, lag, batch_size, n_batches):
    """One deep-TICA epoch in torch on CPU — the reference's training stack
    (mlcolvar/Lightning are torch CPU underneath; same math, no framework
    overhead: a lower bound)."""
    import torch

    x = torch.from_numpy(np.ascontiguousarray(features, dtype=np.float32))
    mu, sd = x.mean(0), x.std(0) + 1e-8
    x = (x - mu) / sd
    xt, xl = x[:-lag], x[lag:]
    d_in = x.shape[1]
    net = torch.nn.Sequential(
        torch.nn.Linear(d_in, 64), torch.nn.Tanh(),
        torch.nn.Linear(64, 64), torch.nn.Tanh(),
        torch.nn.Linear(64, 2),
    )
    opt = torch.optim.Adam(net.parameters(), lr=1e-3)
    perm = (
        np.random.default_rng(0)
        .permutation(xt.shape[0])[: n_batches * batch_size]
        .reshape(n_batches, batch_size)
    )

    def step(idx):
        bt, bl = xt[idx], xl[idx]
        qt, ql = net(bt), net(bl)
        m = 0.5 * (qt.mean(0) + ql.mean(0))
        a, b = qt - m, ql - m
        n = bt.shape[0]
        c0 = 0.5 * (a.T @ a + b.T @ b) / n + 1e-5 * torch.eye(2)
        ctau = 0.5 * (a.T @ b + b.T @ a) / n
        li = torch.linalg.inv(torch.linalg.cholesky(c0))
        loss = -torch.linalg.eigvalsh(li @ ctau @ li.T).sum()
        opt.zero_grad()
        loss.backward()
        opt.step()

    step(torch.from_numpy(perm[0]).long())  # warmup (lazy allocations)
    t0 = time.time()
    for b in range(n_batches):
        step(torch.from_numpy(perm[b]).long())
    return time.time() - t0


# ---------------------------------------------------------------------------
# Main
# ---------------------------------------------------------------------------

def main() -> None:
    import jax
    import jax.numpy as jnp

    from deep_cartograph_tpu.cv.deep import make_deep_tica_loss
    from deep_cartograph_tpu.features.grammar import compile_plan
    from deep_cartograph_tpu.geom.kernels import PlanEvaluator
    from deep_cartograph_tpu.io.dcd import iter_dcd_chunks_prefetch, write_dcd
    from deep_cartograph_tpu.io.topology import Topology
    from deep_cartograph_tpu.models.networks import DeepTICANet
    from deep_cartograph_tpu.models.training import Trainer, TrainerConfig
    from deep_cartograph_tpu.stats.descriptors import _entropy_all, _std_all
    from tests.fixtures import write_ca_pdb

    dev = jax.devices()[0]
    tmpdir = tempfile.mkdtemp(prefix="bench_")

    # ---- setup (untimed): trajectory on disk + compiled feature plan ----
    coords = make_trajectory(N_FRAMES, N_ATOMS)
    dcd_path = os.path.join(tmpdir, "traj.dcd")
    write_dcd(dcd_path, coords)
    pdb_path = os.path.join(tmpdir, "top.pdb")
    write_ca_pdb(pdb_path, coords[0])
    top = Topology.from_pdb(pdb_path)
    labels = make_labels(N_ATOMS)
    plan = compile_plan(labels, top)
    n_feat = plan.n_features
    evaluator = PlanEvaluator(plan)
    # eval_raw: big caller chunks run as fixed-shape compiled subchunks
    # (DEEP_CARTO_COMPILE_CHUNK) — compile cost is per plan SHAPE, not per
    # caller chunk size, and the persistent cache reuses it across runs.
    feature_fn = lambda chunk: evaluator.eval_raw(chunk)

    # int16 transport: quantize on host (timed, inside the leg), ship half
    # the bytes, dequantize on device, featurize the device-resident f32
    # coords — the shipped Featurizer upload="int16" composition.
    if UPLOAD_DTYPE == "int16":
        from deep_cartograph_tpu.io.upload import dequant_fn, quantize_coords

        dq = dequant_fn()

        def feature_from_chunk(chunk):
            q, s, o = quantize_coords(chunk)
            return feature_fn(dq(jnp.asarray(q), jnp.asarray(s), jnp.asarray(o)))

    else:

        def feature_from_chunk(chunk):
            return feature_fn(jax.device_put(chunk))

    t0 = time.time()
    _sync(feature_fn(jnp.zeros((CHUNK, N_ATOMS, 3), jnp.float32)))
    if UPLOAD_DTYPE == "int16":
        _sync(dq(jnp.zeros((CHUNK, N_ATOMS, 3), jnp.int16),
                 jnp.ones(3, jnp.float32), jnp.zeros(3, jnp.float32)))
    featurize_compile_s = time.time() - t0
    _log(f"featurize compile {featurize_compile_s:.1f}s ({n_feat} features)")

    # Filter program: entropy + std on device (features.filter's statistics,
    # stats/descriptors kernels), quantile screen on host over tiny vectors.
    @jax.jit
    def stats_fn(feats):
        return _entropy_all(feats), _std_all(feats)

    @jax.jit
    def normalize_fn(feats):
        mu = jnp.mean(feats, 0)
        sd = jnp.std(feats, 0) + 1e-8
        return (feats - mu) / sd

    def tpu_pipeline():
        """DCD on disk -> trained deepTICA params; returns timings."""
        t_start = time.time()
        blocks = []
        for chunk in iter_dcd_chunks_prefetch(dcd_path, CHUNK):
            blocks.append(feature_from_chunk(chunk))
        features = jnp.concatenate(blocks)[:N_FRAMES]
        _sync(features)
        t_feat = time.time() - t_start

        t0 = time.time()
        ent, std = stats_fn(features)
        std_h = np.asarray(std)
        _ = np.asarray(ent)  # entropy computed & pulled like the Filter does
        thr = np.quantile(std_h, STD_QUANTILE)
        keep = np.where(std_h >= thr)[0].astype(np.int32)
        filtered = jnp.take(features, jnp.asarray(keep), axis=1)
        normed = normalize_fn(filtered)
        x_t, x_lag = normed[:-LAG], normed[LAG:]
        _sync(x_t)
        t_filter = time.time() - t0

        d_in = int(keep.shape[0])
        net = DeepTICANet(
            layers=(d_in, 64, 64, 2),
            options={
                "activation": ["tanh", "tanh", None],
                "dropout": [],
                "batchnorm": [],
            },
        )
        params = net.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
            jnp.zeros((2, d_in), jnp.float32),
            train=False,
        )["params"]
        loss_fn = make_deep_tica_loss(net, 1e-5, 2)
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
            # whole training = ONE device dispatch (the shipped deep-CV
            # path: Trainer.fit_ensemble with chunked epochs)
            ensemble_epoch_chunk=EPOCHS,
        )
        # One Trainer per feature width: its compilation cache makes the
        # timed pass reuse the warm pass's XLA executables.
        trainer = trainers.setdefault(d_in, Trainer(loss_fn, config))
        full = {"data": x_t, "data_lag": x_lag}
        n_tot = int(x_t.shape[0])
        n_valid = min(BATCH, n_tot)  # small BENCH_FRAMES: stay in range
        train_idx = np.arange(n_tot, dtype=np.int32)[None]
        valid_idx = np.arange(n_tot - n_valid, n_tot, dtype=np.int32)[None]
        params_stack = jax.tree.map(lambda a: a[None], params)
        t0 = time.time()
        result = trainer.fit_ensemble(
            params_stack, full, train_idx, valid_idx, [0]
        )[0]
        final_loss = float(result.score)
        t_train = time.time() - t0
        total = time.time() - t_start
        return {
            "t_feat": t_feat,
            "t_filter": t_filter,
            "t_train": t_train,
            "total": total,
            "d_in": d_in,
            "final_loss": final_loss,
            "features": features,
        }

    trainers: dict = {}

    t_compile0 = time.time()
    warm = tpu_pipeline()  # compiles filter + epoch programs
    cold_total_s = (time.time() - t_compile0) + featurize_compile_s
    _log(
        f"pipeline warm (incl. compiles) {time.time() - t_compile0:.1f}s, "
        f"d_in={warm['d_in']}, loss={warm['final_loss']:.4f}"
    )
    features_dev = warm.pop("features")

    # The tunnel's bandwidth fluctuates ~2-3x run to run AND day to day
    # (r03 captured an 18.7x artifact on a ~14 MB/s tunnel vs the ~47 MB/s
    # link measured here) — so (a) take >=5 repeats and report the full
    # spread, (b) measure the LINK bandwidth itself (one device_put of the
    # full coordinate payload) alongside each run so a degraded-tunnel
    # artifact is self-diagnosing: upload_effective_MBps ~ link_probe_MBps
    # means the pipeline rides the link; a healthy link with a slow
    # pipeline would be a real regression.
    n_reps = int(os.environ.get("BENCH_REPS", 5))
    runs = []
    link_probes = []
    upload_mb = coords.nbytes / (1024 * 1024)
    for _ in range(n_reps):
        r = tpu_pipeline()
        r.pop("features")
        runs.append(r)
        t0 = time.time()
        _sync(jax.device_put(coords))
        link_probes.append(upload_mb / (time.time() - t0))
    best = min(runs, key=lambda r: r["total"])
    totals = sorted(r["total"] for r in runs)
    link_probe_mbps = max(link_probes)
    # Effective upload rate of the shipped leg: payload / (featurize leg
    # minus its decode-only and device-compute floors would overstate it;
    # keep the honest upload-dominated quotient). Payload = bytes actually
    # transported (half of f32 under int16 transport).
    payload_mb = upload_mb / (2 if UPLOAD_DTYPE == "int16" else 1)
    upload_effective_mbps = payload_mb / best["t_feat"]
    _log(
        f"tpu end-to-end best {best['total']:.2f}s of {totals} "
        f"(feat {best['t_feat']:.2f} / filter {best['t_filter']:.2f} / "
        f"train {best['t_train']:.2f}); link {link_probe_mbps:.1f} MB/s"
    )

    # Device-resident featurize rate (coords already in HBM) for MFU.
    # Dispatch overhead through the tunnel is ~2-3 ms per call — real device
    # compute is ~1 ms per 20k-frame chunk — so the rate is measured over
    # MANY back-to-back async dispatches and synced once (on PCIe-attached
    # hosts dispatch is ~10 us and this distinction vanishes).
    dev_chunks = [
        jax.device_put(coords[c : c + CHUNK]) for c in range(0, N_FRAMES, CHUNK)
    ]
    _sync(dev_chunks)
    reps = 10
    t_dev = float("inf")
    for _ in range(2):
        t0 = time.time()
        for _ in range(reps):
            outs = [feature_fn(c) for c in dev_chunks]
        _sync(outs)
        t_dev = min(t_dev, (time.time() - t0) / reps)
    del dev_chunks, outs

    # ---- XLA-on-host-CPU featurize mirror (same program, CPU backend) ----
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    xla_cpu_featurize_s = None
    if cpu is not None and cpu != dev:
        # XLA:CPU AOT cache entries bake in host machine features; an entry
        # compiled on a different host risks SIGILL on load (cpu_aot_loader
        # machine-feature mismatch). Compile this leg fresh, cache disabled.
        try:
            jax.config.update("jax_enable_compilation_cache", False)
        except AttributeError:
            pass
        try:
            with jax.default_device(cpu):
                cpu_eval = PlanEvaluator(plan, device=cpu)
                cpu_fn = cpu_eval.device_fn()
                sub = jnp.asarray(coords[:CHUNK])
                _sync(cpu_fn(sub))  # compile
                t0 = time.time()
                _sync(cpu_fn(sub))
                xla_cpu_featurize_s = (time.time() - t0) * (N_FRAMES / CHUNK)
        finally:
            try:
                jax.config.update("jax_enable_compilation_cache", True)
            except AttributeError:
                pass

    # ---- reference-style CPU pipeline (subsets, scaled) ----
    ii, jj = np.triu_indices(N_ATOMS, k=2)
    pairs = np.stack([ii, jj], 1)
    quads = np.stack(
        [np.arange(N_ATOMS - 3) + k for k in range(4)], 1
    )
    feat_sub = min(2000, N_FRAMES)
    t_ref_feat = ref_serial_featurize(coords[:feat_sub], pairs, quads) * (
        N_FRAMES / feat_sub
    )

    # Transport parity: exact f32 upload of the first chunk vs the pipeline's
    # (possibly int16-transported) features for the same frames. Bounds what
    # fixed-point transport does to every downstream consumer.
    parity_int16 = None
    quant_step_A = None
    if UPLOAD_DTYPE == "int16":
        from deep_cartograph_tpu.io.upload import (
            quantization_step,
            quantize_coords,
        )

        exact0 = np.asarray(feature_fn(jax.device_put(coords[:CHUNK])))
        parity_int16 = float(
            np.max(np.abs(exact0 - np.asarray(features_dev[:CHUNK])))
        )
        del exact0
        quant_step_A = quantization_step(quantize_coords(coords[:CHUNK])[1])
        _log(
            f"int16 transport parity: max feature delta {parity_int16:.2e} "
            f"(step {quant_step_A:.1e} A)"
        )
        # Distances move by ~the step (1e-4 nm class); dihedral sin/cos
        # amplify it ~100x near degenerate quads, so the honest bound is
        # ~2e-2 — still 3x TIGHTER than what the reference's own XTC disk
        # rounding (1e-3 A) does to the same trig features. Downstream
        # invariance is the real gate: the filtered set and final loss
        # match float32 transport exactly at smoke scale (d_in 586, loss
        # -2.00156 both ways), and n_filtered/final_loss are in the
        # artifact for every run.
        assert parity_int16 < 2.5e-2, parity_int16

    # Host features for the CPU-side text I/O / stats / training inputs
    host_features = np.asarray(features_dev)
    io_sub = min(2000, N_FRAMES)
    write_s, read_s = ref_text_io_seconds(host_features[:io_sub], tmpdir)
    scale = N_FRAMES / io_sub
    t_ref_write = write_s * scale
    t_ref_read = read_s * scale
    # The reference reads the colvars file at least twice (filter +
    # training, SURVEY 3.4); its filter actually re-reads PER FEATURE.
    t_ref_io = t_ref_write + 2 * t_ref_read
    per_feature_reread_estimate = t_ref_read * n_feat

    stats_probe = 100
    t_ref_stats = ref_filter_stats_seconds(host_features, stats_probe) * (
        n_feat / stats_probe
    )

    # ---- MEASURED reference code (not a reconstruction): run the actual
    # /root/reference filter.py + colvars.py in a subprocess on bench-shaped
    # colvars subsets (bench_ref_runner.py). read scales linearly in frames;
    # the Filter loop re-reads the whole file per feature, so its full-run
    # estimate scales by (features/probe)^2 x (frames/subset).
    ref_measured = ref_measured_seconds(host_features, io_sub, tmpdir)

    std_h = np.std(host_features, axis=0)
    keep = np.where(std_h >= np.quantile(std_h, STD_QUANTILE))[0]
    filtered_host = host_features[:, keep]
    batch = min(BATCH, max(N_FRAMES - LAG, 2))
    n_batches = max((N_FRAMES - LAG) // batch, 1)
    t_ref_epoch = ref_torch_epoch_seconds(filtered_host, LAG, batch, n_batches)
    t_ref_train = t_ref_epoch * EPOCHS

    total_ref = t_ref_feat + t_ref_io + t_ref_stats + t_ref_train
    total_tpu = best["total"]

    # ---- MFU of the selector contraction (distances dominate the FLOPs) --
    n_dist = pairs.shape[0]
    flops_feat = N_FRAMES * 2.0 * N_ATOMS * n_dist * 3
    tflops = flops_feat / t_dev / 1e12
    mfu = flops_feat / t_dev / V5E_BF16_PEAK

    e2e_fps = N_FRAMES / total_tpu
    result = {
        "metric": "featurize_filter_deeptica_frames_per_sec",
        "value": round(e2e_fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(total_ref / total_tpu, 2),
        "detail": {
            "device": str(dev),
            "n_frames": N_FRAMES,
            "n_features": int(n_feat),
            "n_filtered": best["d_in"],
            "epochs": EPOCHS,
            "tpu_total_s": round(total_tpu, 3),
            "tpu_total_runs_s": [round(t, 3) for t in totals],
            "tpu_total_min_s": round(totals[0], 3),
            "tpu_total_median_s": round(totals[len(totals) // 2], 3),
            "tpu_total_max_s": round(totals[-1], 3),
            "cold_total_s": round(cold_total_s, 1),
            "warm_total_s": round(totals[0], 3),
            "featurize_compile_s": round(featurize_compile_s, 1),
            "link_probe_MBps": round(link_probe_mbps, 1),
            "link_probe_runs_MBps": [round(x, 1) for x in link_probes],
            "upload_effective_MBps": round(upload_effective_mbps, 1),
            "upload_payload_MB": round(payload_mb, 1),
            "upload_dtype": UPLOAD_DTYPE,
            "int16_feature_parity_max": parity_int16,
            "quantization_step_A": quant_step_A,
            "tpu_featurize_upload_inclusive_s": round(best["t_feat"], 3),
            "tpu_featurize_device_resident_s": round(t_dev, 4),
            "tpu_filter_s": round(best["t_filter"], 3),
            "tpu_train_s": round(best["t_train"], 3),
            "upload_inclusive_frames_per_sec": round(
                N_FRAMES / best["t_feat"], 1
            ),
            "device_resident_frames_per_sec": round(N_FRAMES / t_dev, 1),
            "selector_tflops": round(tflops, 3),
            "mfu_vs_v5e_bf16_peak": round(mfu, 5),
            # f32 at HIGHEST = 6 bf16 MXU passes -> achievable ceiling is
            # peak/6; the distance core alone measures ~91% of it.
            "mfu_vs_f32_highest_ceiling": round(mfu * 6, 5),
            "ref_style_cpu_total_s": round(total_ref, 2),
            "ref_featurize_serial_s": round(t_ref_feat, 2),
            "ref_colvars_write_s": round(t_ref_write, 2),
            "ref_colvars_read_x2_s": round(2 * t_ref_read, 2),
            "ref_filter_stats_s": round(t_ref_stats, 2),
            "ref_torch_train_s": round(t_ref_train, 2),
            "ref_filter_per_feature_reread_s_estimate": round(
                per_feature_reread_estimate, 0
            ),
            # Measured by executing the reference's OWN filter.py/colvars.py
            # (subprocess on /root/reference; see bench_ref_runner.py).
            **(ref_measured or {"ref_measured_read_s": None}),
            "xla_cpu_featurize_s": (
                round(xla_cpu_featurize_s, 2)
                if xla_cpu_featurize_s is not None
                else None
            ),
            "final_loss": best["final_loss"],
            "notes": (
                "vs_baseline is end-to-end: TPU side includes host DCD "
                "decode + tunnel upload (~40 MB/s here; PCIe-attached hosts "
                "are >100x faster; upload_dtype int16 = fixed-point "
                "transport in XTC's precision class, parity recorded in "
                "int16_feature_parity_max); CPU side includes the "
                "reference's "
                "inter-step colvars text write + 2 reads but NOT its "
                "per-feature re-read filter design (estimate in detail). "
                "MFU is for the full featurize program (distances + "
                "dihedral trig), f32 on MXU; the distance selector core "
                "alone runs at ~91% of the f32-HIGHEST (bf16x6) MXU "
                "ceiling when timed in isolation. PLUMED-export "
                "validation remains interpreter-level only: no plumed "
                "binary exists in this image (README 'Export "
                "validation')."
            ),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    from bench_common import run_with_recovery

    run_with_recovery(main, __file__, "BENCH_ATTEMPT", tag="bench")
