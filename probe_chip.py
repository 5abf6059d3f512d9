"""Chip-health probe: characterize the current axon tunnel/HBM state.

Fresh-process ladder — each rung syncs and reports, so the FIRST failing
rung identifies the failure class:
  init -> memory_stats -> tiny put -> tiny program -> 32 MB put ->
  384 MB zeros program -> 128 MB put -> 384 MB put

Run: timeout 600 python probe_chip.py   (takes the chip lock, tag=probe)
"""

from __future__ import annotations

import json
import sys
import time


def rung(name, fn, out):
    t0 = time.time()
    try:
        extra = fn() or {}
        out[name] = {"ok": True, "s": round(time.time() - t0, 2), **extra}
        print(f"[probe] {name}: ok {out[name]}", file=sys.stderr, flush=True)
        return True
    except Exception as exc:
        out[name] = {
            "ok": False,
            "s": round(time.time() - t0, 2),
            "err": str(exc)[:300],
        }
        print(f"[probe] {name}: FAIL {out[name]}", file=sys.stderr, flush=True)
        return False


def main():
    out = {}
    import jax
    import jax.numpy as jnp
    import numpy as np

    t0 = time.time()
    dev = jax.devices()[0]
    out["init"] = {"ok": True, "s": round(time.time() - t0, 2),
                   "device": str(dev)}
    print(f"[probe] init: {out['init']}", file=sys.stderr, flush=True)

    def stats():
        st = dev.memory_stats() or {}
        return {
            "bytes_in_use": st.get("bytes_in_use"),
            "peak_bytes_in_use": st.get("peak_bytes_in_use"),
            "bytes_limit": st.get("bytes_limit"),
        }

    rung("memory_stats", stats, out)

    rung("tiny_put", lambda: float(
        jnp.ravel(jax.device_put(np.ones(8, np.float32)))[0]) and {}, out)
    rung("tiny_program", lambda: float(
        (jnp.arange(8.0) + 1.0)[0]) and {}, out)
    rung("put_32mb", lambda: float(jnp.ravel(jax.device_put(
        np.ones((8388608,), np.float32)))[0]) and {}, out)
    rung("memory_stats_2", stats, out)
    rung("zeros_384mb_program", lambda: float(jnp.ravel(
        jnp.zeros((100000, 320, 3), jnp.float32))[0]) == 0.0 and {}, out)
    rung("memory_stats_3", stats, out)
    rung("put_128mb", lambda: float(jnp.ravel(jax.device_put(
        np.ones((33554432,), np.float32)))[0]) and {}, out)
    rung("put_384mb", lambda: float(jnp.ravel(jax.device_put(
        np.ones((100000, 320, 3), np.float32)))[0]) and {}, out)
    rung("memory_stats_4", stats, out)

    print(json.dumps(out))
    with open("/tmp/probe_chip_result.json", "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    from bench_common import acquire_chip_lock

    acquire_chip_lock("probe")
    main()
