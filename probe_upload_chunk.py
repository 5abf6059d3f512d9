"""Probe: featurize-leg wall-clock vs transport chunk size (int16 path).

The bench's upload-inclusive featurize leg ships N_FRAMES of int16 coords
in CHUNK-sized device_puts; each put pays tunnel RTT/dispatch overhead on
top of wire time. This probe times the exact bench leg (native prefetch
decode -> host quantize -> put -> fused dequant+featurize) at several
chunk sizes in ONE process to pick the default. Prints one JSON line.
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

import bench  # module-level constants/helpers only; main() is guarded

import jax
import jax.numpy as jnp

from deep_cartograph_tpu.features.grammar import compile_plan
from deep_cartograph_tpu.geom.kernels import PlanEvaluator
from deep_cartograph_tpu.io.dcd import iter_dcd_chunks_prefetch, write_dcd
from deep_cartograph_tpu.io.topology import Topology
from deep_cartograph_tpu.io.upload import dequant_fn, quantize_coords
from tests.fixtures import write_ca_pdb

N_FRAMES = int(os.environ.get("BENCH_FRAMES", 100_000))
N_ATOMS = 48
CHUNKS = [int(c) for c in os.environ.get("PROBE_CHUNKS", "10000,20000,50000,100000").split(",")]


def _sync(x):
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), x)


def main():
    tmpdir = tempfile.mkdtemp(prefix="probe_chunk_")
    coords = bench.make_trajectory(N_FRAMES, N_ATOMS)
    dcd = os.path.join(tmpdir, "traj.dcd")
    write_dcd(dcd, coords)
    pdb = os.path.join(tmpdir, "top.pdb")
    write_ca_pdb(pdb, coords[0])
    plan = compile_plan(bench.make_labels(N_ATOMS), Topology.from_pdb(pdb))
    evaluator = PlanEvaluator(plan)
    dq = dequant_fn()

    def leg(chunk):
        blocks = []
        for c in iter_dcd_chunks_prefetch(dcd, chunk):
            q, s, o = quantize_coords(c)
            blocks.append(
                evaluator.eval_raw(dq(jnp.asarray(q), jnp.asarray(s), jnp.asarray(o)))
            )
        feats = jnp.concatenate(blocks)[:N_FRAMES]
        _sync(feats)
        return feats

    results = {}
    for chunk in CHUNKS:
        # warm compile for this chunk shape (dequant + concat shapes)
        _sync(leg(chunk))
        best = []
        for _ in range(3):
            t0 = time.time()
            _sync(leg(chunk))
            best.append(round(time.time() - t0, 3))
        results[str(chunk)] = {"runs_s": sorted(best), "best_s": min(best)}
        print(f"[probe] chunk={chunk}: {sorted(best)}", file=sys.stderr)

    print(json.dumps({"metric": "featurize_leg_s_by_chunk", "frames": N_FRAMES,
                      "results": results}))


if __name__ == "__main__":
    from bench_common import run_with_recovery

    run_with_recovery(main, __file__, "PROBE_ATTEMPT", tag="probe_chunk")
