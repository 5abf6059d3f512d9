"""Isolate the coords-residency assembly failure (round 5).

Uploads 24x16 MB parts serialized (the pattern that succeeds), then tries
each assembly shape in turn, reporting which fails:
  A. one 24-arg concatenate program
  B. 2-arg concatenate of the first two parts (arg-count control)
  C. incremental dynamic_update_slice into a zeros buffer
  D. one-shot 384 MB device_put (for the record on this chip state)

Run: timeout 900 python probe_concat.py
"""

from __future__ import annotations

import sys
import time

import numpy as np


def rung(name, fn):
    t0 = time.time()
    try:
        fn()
        print(f"[concat] {name}: ok ({time.time() - t0:.1f}s)",
              file=sys.stderr, flush=True)
        return True
    except Exception as exc:
        print(f"[concat] {name}: FAIL ({time.time() - t0:.1f}s) "
              f"{str(exc)[:200]}", file=sys.stderr, flush=True)
        return False


def main():
    import jax
    import jax.numpy as jnp

    n_parts, rows = 24, 4369  # 4369*320*3*4 = 16 MB
    host = np.ones((rows, 320, 3), np.float32)

    def upload_parts(k):
        parts = []
        for i in range(k):
            p = jax.device_put(host)
            assert float(p[0, 0, 0]) == 1.0
            parts.append(p)
        return parts

    parts = None

    def _up():
        nonlocal parts
        parts = upload_parts(n_parts)

    if not rung(f"upload_{n_parts}x16mb_serialized", _up):
        return

    rung("concat_24args", lambda: float(
        jax.jit(lambda *xs: jnp.concatenate(xs, 0))(*parts)[0, 0, 0]))

    rung("concat_2args", lambda: float(
        jax.jit(lambda a, b: jnp.concatenate((a, b), 0))(
            parts[0], parts[1])[0, 0, 0]))

    def _incremental():
        buf = jax.jit(lambda: jnp.zeros((rows * n_parts, 320, 3),
                                        jnp.float32))()
        upd = jax.jit(
            lambda b, p, s: jax.lax.dynamic_update_slice(b, p, (s, 0, 0)))
        for i, p in enumerate(parts):
            buf = upd(buf, p, jnp.int32(i * rows))
        assert float(buf[0, 0, 0]) == 1.0

    rung("incremental_update_slice", _incremental)

    rung("oneshot_put_384mb", lambda: float(jax.device_put(
        np.ones((rows * n_parts, 320, 3), np.float32))[0, 0, 0]))


if __name__ == "__main__":
    from bench_common import ChipLockUnavailable, acquire_chip_lock

    try:
        acquire_chip_lock("probe_concat", timeout_s=120)
    except ChipLockUnavailable as exc:
        print(f"[concat] chip busy: {exc}", file=sys.stderr, flush=True)
        sys.exit(0)
    main()
