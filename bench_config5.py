"""BASELINE config 5 measured for real: 100k frames x 50k features HTICA.

The 20 GB fp32 feature matrix never exists at once: frames are generated and
featurized ON DEVICE in blocks (the decode/upload stage is benchmarked
separately in bench.py; this benchmark is the covariance/eigh machinery at
full config-5 shape) and StreamingHTICA (cv/htica_stream.py) accumulates
per-subspace time-lagged covariances in two passes.

Writes BENCH_config5.json with wall-clock and device-memory numbers.
Run: python bench_config5.py    (single chip; ~2 GB HBM peak)
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

N_FRAMES = 100_000
N_ATOMS = 320
N_FEATURES = 50_000
BLOCK = int(__import__("os").environ.get("CFG5_BLOCK", 2_500))
NUM_SUBSPACES = 50
SUB_OUT = 5
CV_DIM = 2
LAG = 10


def main() -> None:
    import jax
    import jax.numpy as jnp

    from deep_cartograph_tpu.cv.htica_stream import StreamingHTICA

    dev = jax.devices()[0]
    rng = np.random.default_rng(0)

    # On-device trajectory generator: low-frequency collective modes
    t = np.linspace(0, 6 * np.pi, N_ATOMS)
    base = np.stack([3.0 * np.cos(t), 3.0 * np.sin(t), 1.0 * t], 1).astype(
        np.float32
    )
    n_modes = 10
    phases = jnp.asarray(rng.uniform(0, 2 * np.pi, n_modes).astype(np.float32))
    freqs = jnp.asarray(rng.uniform(0.5, 3.0, n_modes).astype(np.float32))
    shapes = jnp.asarray(
        (rng.standard_normal((n_modes, N_ATOMS, 3)) * 0.2).astype(np.float32)
    )
    base_d = jnp.asarray(base)

    ii, jj = np.triu_indices(N_ATOMS, k=2)
    ii, jj = ii[:N_FEATURES], jj[:N_FEATURES]
    sel = np.zeros((N_ATOMS, N_FEATURES), np.float32)
    sel[ii, np.arange(N_FEATURES)] = 1.0
    sel[jj, np.arange(N_FEATURES)] -= 1.0
    sel_d = jnp.asarray(sel)

    base_key = jax.random.PRNGKey(7)

    @jax.jit
    def gen_features(frame_ids):
        tt = frame_ids.astype(jnp.float32) / N_FRAMES * 2 * jnp.pi
        waves = jnp.sin(freqs[None, :] * tt[:, None] + phases[None, :])
        coords = base_d[None] + jnp.einsum("fm,mad->fad", waves, shapes)
        # Per-frame thermal noise keeps C0 full-rank (a noiseless 10-mode
        # signal gives rank-deficient subspace covariances -> degenerate
        # eigenproblems at 100k-frame accumulation). Keyed on the block's
        # first frame id: deterministic and restartable across passes.
        key = jax.random.fold_in(base_key, frame_ids[0])
        coords = coords + 0.05 * jax.random.normal(
            key, coords.shape, jnp.float32
        )
        d2 = None
        for axis in range(3):
            v = coords[:, :, axis] @ sel_d
            d2 = v * v if d2 is None else d2 + v * v
        return jnp.sqrt(d2) * 0.1

    def block_iter():
        for start in range(0, N_FRAMES, BLOCK):
            yield gen_features(jnp.arange(start, start + BLOCK))

    # Warm the generator program (compile excluded, as in bench.py)
    t0 = time.time()
    first = gen_features(jnp.arange(BLOCK))
    float(jnp.ravel(first)[0])
    print(f"[config5] featurize compile {time.time() - t0:.1f}s",
          file=sys.stderr, flush=True)

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
    fit_s = time.time() - t0

    mem = {}
    try:
        stats = dev.memory_stats() or {}
        mem = {
            "hbm_peak_bytes": stats.get("peak_bytes_in_use"),
            "hbm_now_bytes": stats.get("bytes_in_use"),
        }
    except Exception:
        pass
    if mem.get("hbm_peak_bytes") is None:
        # The tunneled axon backend exposes no memory_stats; report the
        # analytic resident-set bound of the streaming path instead: one
        # (BLOCK, F) feature block + the per-subspace covariance
        # accumulators (S x (F/S)^2 x 2 matrices) + a lag buffer.
        sub_f = N_FEATURES // NUM_SUBSPACES
        mem["hbm_estimate_bytes"] = int(
            BLOCK * N_FEATURES * 4
            + NUM_SUBSPACES * sub_f * sub_f * 2 * 4
            + LAG * N_FEATURES * 4
        )

    result = {
        "metric": "htica_100k_frames_x_50k_features_wallclock",
        "value": round(fit_s, 2),
        "unit": "s",
        "detail": {
            "device": str(dev),
            "n_frames": N_FRAMES,
            "n_features": N_FEATURES,
            "block_frames": BLOCK,
            "num_subspaces": NUM_SUBSPACES,
            "subspaces_dimension": SUB_OUT,
            "cv_dimension": CV_DIM,
            "lag_time": LAG,
            "frames_per_sec": round(N_FRAMES * 2 / fit_s, 1),  # two passes
            "top_eigenvalues": [round(float(v), 5) for v in sh.eigenvalues_],
            **mem,
            "notes": (
                "Feature blocks generated+featurized on device (no 20 GB "
                "host matrix exists); StreamingHTICA two-pass covariance "
                "accumulation + vmapped level-1 eigensolves. bench.py "
                "covers decode/upload; this is the config-5 linear-algebra "
                "path at full shape."
            ),
        },
    }
    print(json.dumps(result))
    with open("BENCH_config5.json", "w") as fh:
        json.dump(result, fh, indent=1)


if __name__ == "__main__":
    try:
        main()
    except Exception as exc:
        print(f"[config5] first attempt failed ({exc}); retrying once",
              file=sys.stderr, flush=True)
        time.sleep(10)
        main()
