"""Streaming tool-path benchmark: tools/train_colvars with `streaming: true`
vs the in-memory path on the SAME on-disk colvars file — parity + throughput.

Round 4 shipped larger-than-RAM streaming across the linear CVs /
projection / filter (io/colvars.iter_features_chunks -> StreamingHTICA
covariances); the CPU-mesh tests pin correctness, but no artifact anchored
the host-side reader throughput or a streamed-vs-resident parity number on
hardware (VERDICT r04 item 7). This bench drives the SHIPPED tool
(tools/train_colvars.train_colvars, cvs=[pca, tica]) twice over one
PLUMED-format colvars file:

  - `streaming: true`  — bounded-memory: the feature matrix is never
    materialized; blocks flow file -> native parser -> device accumulators.
  - `streaming: false` — the in-memory reader materializes the matrix.

and records per-CV projected-trajectory parity (max abs diff of the CSVs),
wall-clocks, and the raw iter_features_chunks reader throughput (MB/s,
measured separately over one full pass with the parse cache cleared).

The file here (~STREAM_FRAMES x STREAM_FEATURES, default ~0.7 GB) fits in
RAM so the resident run CAN execute for the parity check; the streaming
path's memory use is bounded by chunk_rows regardless of file size, so the
parity + throughput measured here is the evidence for the >RAM regime
(where the resident run simply cannot run).

Writes BENCH_streaming.json and prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

N_ROWS = int(os.environ.get("STREAM_FRAMES", 300_000))
N_ATOMS = 24
LAG = 10


def _log(msg: str) -> None:
    print(f"[streaming] {msg}", file=sys.stderr, flush=True)
    from bench_common import refresh_chip_heartbeat

    refresh_chip_heartbeat()


def _labels():
    ii, jj = np.triu_indices(N_ATOMS, k=2)
    return [f"dist-@CA_{a + 1}-@CA_{b + 1}" for a, b in zip(ii, jj)]


def _make_features(n_rows: int, n_feat: int) -> np.ndarray:
    """Slow collective modes + noise, positive (distance-like) values."""
    rng = np.random.default_rng(3)
    n_modes = 6
    slow = np.zeros((n_rows, n_modes), np.float32)
    noise = rng.standard_normal((n_rows, n_modes)).astype(np.float32)
    for m in range(n_modes):
        a = 0.995 - 0.003 * m
        for i in range(1, n_rows):
            slow[i, m] = a * slow[i - 1, m] + 0.1 * noise[i, m]
    mix = rng.standard_normal((n_modes, n_feat)).astype(np.float32)
    feats = slow @ mix + 0.2 * rng.standard_normal(
        (n_rows, n_feat)
    ).astype(np.float32)
    return (feats + 8.0).astype(np.float32)  # distance-like offset


def _tool_config(streaming) -> dict:
    return {
        "cvs": ["pca", "tica"],
        "common": {
            "dimension": 2,
            "lag_time": LAG,
            "features_normalization": "mean_std",
            "streaming": streaming,
        },
        "figures": {
            "fes": {"compute": False},
            "traj_projection": {"plot": False},
        },
    }


def main() -> None:
    from deep_cartograph_tpu.io.colvars import (
        clear_memory_cache,
        iter_features_chunks,
        write_colvars,
    )
    from deep_cartograph_tpu.tools.train_colvars import train_colvars
    from deep_cartograph_tpu.utils.demo_data import write_ca_pdb

    labels = _labels()
    n_feat = len(labels)

    tmpdir = tempfile.mkdtemp(prefix="bench_stream_")
    pdb_path = os.path.join(tmpdir, "top.pdb")
    t = np.linspace(0, 4 * np.pi, N_ATOMS)
    coords = np.stack(
        [2.3 * np.cos(t), 2.3 * np.sin(t), 1.5 * t], 1
    ).astype(np.float32)
    write_ca_pdb(pdb_path, coords)

    # Cached across attempts/runs: generation is seeded and deterministic.
    colvars_path = os.path.join(
        tempfile.gettempdir(), f"bench_stream_{N_ROWS}x{n_feat}.dat"
    )
    if not os.path.exists(colvars_path):
        t0 = time.time()
        feats = _make_features(N_ROWS, n_feat)
        body = np.concatenate(
            [np.arange(N_ROWS, dtype=np.float32)[:, None], feats], axis=1
        )
        write_colvars(colvars_path, body, ["time"] + labels)
        del feats, body
        _log(f"colvars write {time.time() - t0:.1f}s")
    file_mb = os.path.getsize(colvars_path) / 2**20
    _log(f"colvars file {file_mb:.0f} MB ({N_ROWS} rows x {n_feat} features)")

    # ---- raw streaming-reader throughput: ONE full pass, cache cleared ---
    clear_memory_cache()
    t0 = time.time()
    rows = 0
    for block in iter_features_chunks(colvars_path, feature_names=labels):
        rows += block.shape[0]
    reader_pass_s = time.time() - t0
    assert rows == N_ROWS, (rows, N_ROWS)
    reader_mbps = file_mb / reader_pass_s
    _log(f"reader pass {reader_pass_s:.1f}s = {reader_mbps:.0f} MB/s")

    import logging

    class _Capture(logging.Handler):
        def __init__(self):
            super().__init__()
            self.messages = []

        def emit(self, record):
            self.messages.append(record.getMessage())

    def run_tool(mode_name: str, streaming: bool):
        out = os.path.join(tmpdir, mode_name)
        shutil.rmtree(out, ignore_errors=True)
        clear_memory_cache()
        cap = _Capture()
        tool_logger = logging.getLogger("deep_cartograph_tpu")
        prev_level = tool_logger.level
        tool_logger.setLevel(logging.INFO)
        tool_logger.addHandler(cap)
        try:
            t0 = time.time()
            train_colvars(
                configuration=_tool_config(streaming),
                train_colvars_paths=[colvars_path],
                train_topologies=[pdb_path],
                features_list=labels,
                output_folder=out,
            )
            elapsed = time.time() - t0
        finally:
            tool_logger.removeHandler(cap)
            tool_logger.setLevel(prev_level)
        return elapsed, cap.messages

    stream_s, stream_logs = run_tool("stream", True)
    # The streamed run must ACTUALLY stream (no silent in-memory fallback):
    # with one topology == the reference, translation is identity and the
    # bounded-memory path is valid (cv/linear._should_stream).
    assert not any("falling back to in-memory" in m for m in stream_logs), [
        m for m in stream_logs if "falling back" in m
    ]
    assert any("streaming mode" in m for m in stream_logs), (
        "streamed run never entered streaming mode"
    )
    _log(f"tool streamed {stream_s:.1f}s (streaming engaged)")
    mem_s, _ = run_tool("mem", False)
    _log(f"tool in-memory {mem_s:.1f}s")

    # ---- parity: projected trajectories must agree (up to CV sign) -------
    import pandas as pd

    parity = {}
    for cv in ("pca", "tica"):
        a = pd.read_csv(
            os.path.join(
                tmpdir, "stream", cv, "traj_data",
                os.path.splitext(os.path.basename(colvars_path))[0],
                "projected_trajectory.csv",
            )
        ).to_numpy()
        b = pd.read_csv(
            os.path.join(
                tmpdir, "mem", cv, "traj_data",
                os.path.splitext(os.path.basename(colvars_path))[0],
                "projected_trajectory.csv",
            )
        ).to_numpy()
        err = float(
            max(
                min(
                    np.abs(a[:, c] - b[:, c]).max(),
                    np.abs(a[:, c] + b[:, c]).max(),  # sign convention
                )
                for c in range(a.shape[1])
            )
        )
        parity[cv] = err
        assert err < 2e-3, (cv, err)  # CSVs carry 4 decimals
    _log(f"parity streamed-vs-resident: {parity}")

    result = {
        "metric": "streamed_train_colvars_reader_MBps",
        "value": round(reader_mbps, 1),
        "unit": "MB/s",
        "vs_baseline": round(mem_s / stream_s, 3),
        "detail": {
            "colvars_file_MB": round(file_mb, 1),
            "n_rows": N_ROWS,
            "n_features": n_feat,
            "cvs": ["pca", "tica"],
            "streaming": True,
            "tool_streamed_s": round(stream_s, 2),
            "tool_in_memory_s": round(mem_s, 2),
            "reader_pass_s": round(reader_pass_s, 2),
            "reader_MBps": round(reader_mbps, 1),
            "parity_projected_max_abs_diff": {
                k: round(v, 6) for k, v in parity.items()
            },
            "notes": (
                "Both runs drive the shipped tools/train_colvars on the "
                "same on-disk PLUMED-format colvars file; streaming=true "
                "never materializes the feature matrix (bounded memory: "
                "blocks flow file -> native parser -> device accumulators), "
                "so its wall-clock and parity here are the evidence for "
                "inputs larger than host RAM, where the in-memory run "
                "cannot execute. vs_baseline = in_memory_s / streamed_s "
                "on this RAM-fitting file (page cache warm for both). "
                "PLUMED-export validation remains interpreter-level only: "
                "no plumed binary exists in this image (README 'Export "
                "validation')."
            ),
        },
    }
    print(json.dumps(result))
    with open("BENCH_streaming.json", "w") as fh:
        json.dump(result, fh, indent=1)


if __name__ == "__main__":
    from bench_common import run_with_recovery

    run_with_recovery(main, __file__, "STREAM_ATTEMPT", tag="streaming")
