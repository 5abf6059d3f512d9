"""Two-process jax.distributed smoke test for the multi-host seam.

The reference has no distributed runtime (SURVEY §2.5); our pod path is
parallel/mesh.py: init_distributed (jax.distributed over DCN) +
local_shard (per-host work partitioning). This test launches two real
processes on the CPU backend (gloo collectives), each with 2 virtual
devices, and proves the seam end-to-end: coordinator handshake, a global
4-device mesh, a cross-process global-array reduction, and local_shard
partitioning.

Heavier than a unit test (~20 s for two cold JAX processes); skipped when
the CPU gloo collectives implementation is unavailable.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = """
import sys
idx, port = int(sys.argv[1]), sys.argv[2]
sys.path.insert(0, {repo!r})
import numpy as np
import jax
jax.config.update("jax_cpu_collectives_implementation", "gloo")
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from deep_cartograph_tpu.parallel.mesh import init_distributed, local_shard

init_distributed(f"127.0.0.1:{{port}}", 2, idx)
assert jax.process_count() == 2, jax.process_count()
devs = jax.devices()
assert len(devs) == 4, devs

mesh = Mesh(np.array(devs), ("frames",))
sh = NamedSharding(mesh, P("frames"))
local = np.arange(2 * 3, dtype=np.float32).reshape(2, 3) + 10 * idx
garr = jax.make_array_from_process_local_data(sh, local, global_shape=(4, 3))
total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(garr)
got = float(jax.device_get(total.addressable_data(0)))
expect = float(sum((np.arange(6) + 10 * i).sum() for i in (0, 1)))
assert got == expect, (got, expect)

items = ["a", "b", "c", "d", "e"]
assert local_shard(items) == items[idx::2]
print(f"DIST_SMOKE OK {{idx}} sum={{got}}")
"""


def _gloo_available() -> bool:
    try:
        import jax

        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        return True
    except Exception:
        return False


@pytest.mark.skipif(not _gloo_available(),
                    reason="CPU gloo collectives unavailable")
def test_two_process_distributed_init_and_reduce(tmp_path):
    child = tmp_path / "child.py"
    child.write_text(CHILD.format(repo=REPO))
    # Ephemeral-port TOCTOU: another process can grab the port between
    # close() and the coordinator's bind. SO_REUSEADDR plus picking from
    # a kernel-assigned ephemeral port makes a same-window collision
    # vanishingly unlikely; the 240 s communicate() bounds a loss anyway.
    with socket.socket() as s:
        s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    # Env must be scrubbed BEFORE interpreter start: the axon sitecustomize
    # force-registers the TPU backend off PALLAS_AXON_POOL_IPS and
    # overrides JAX_PLATFORMS.
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PALLAS_AXON_POOL_IPS", "XLA_FLAGS", "JAX_PLATFORMS")
    }
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

    procs = [
        subprocess.Popen(
            [sys.executable, str(child), str(i), str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-3000:]}"
        assert f"DIST_SMOKE OK {i}" in out, out[-2000:]
