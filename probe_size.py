"""Print the largest currently-allocatable device buffer (MB), ascending
zeros-program ladder. One line on stdout: e.g. ``max_ok_mb=2048``.

Used by the round-5 HBM-recovery monitor: after a leak/exhaustion episode
the service's asynchronous orphan reclaim frees HBM over time; this probe
(fresh process, chip lock, ~30 s) measures where the ceiling is now.
"""

from __future__ import annotations

import sys
import time


def main() -> None:
    import jax
    import jax.numpy as jnp

    sizes_mb = [64, 256, 1024, 2048, 4096, 6144]
    max_ok = 0
    for mb in sizes_mb:
        try:
            n = mb * (1 << 20) // 4
            t0 = time.time()
            x = jnp.zeros((n,), jnp.float32)
            assert float(x[0]) == 0.0
            del x
            print(
                f"[probe_size] {mb} MB ok ({time.time() - t0:.1f}s)",
                file=sys.stderr,
                flush=True,
            )
            max_ok = mb
        except Exception as exc:
            print(
                f"[probe_size] {mb} MB FAIL: {str(exc)[:120]}",
                file=sys.stderr,
                flush=True,
            )
            break
    print(f"max_ok_mb={max_ok}", flush=True)


if __name__ == "__main__":
    from bench_common import ChipLockUnavailable, acquire_chip_lock

    try:
        acquire_chip_lock("probe_size", timeout_s=60)
    except ChipLockUnavailable as exc:
        print(f"[probe_size] chip busy: {exc}", file=sys.stderr, flush=True)
        print("max_ok_mb=-1", flush=True)
        sys.exit(0)
    main()
