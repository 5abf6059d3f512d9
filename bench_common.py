"""Shared failure-recovery harness for the bench entrypoints.

The remote TPU service has two transient failure classes (measured,
documented in ARCHITECTURE.md "Tunnel notes"):

- "TPU backend error (Aborted)": a transient compile abort; a quick
  same-process retry usually salvages the run.
- RESOURCE_EXHAUSTED / UNAVAILABLE: these poison the client CONNECTION —
  the same process keeps failing the identical allocation for 20+
  minutes while a fresh process succeeds within seconds. The recovery
  unit is the process, so the harness re-execs the script after a
  cool-down long enough for the service's asynchronous orphan reclaim
  (shorter cycles generate upload garbage faster than it is collected).

Deterministic errors (asserts, shape bugs, bad env knobs) re-raise
immediately — nothing transient-looking, no re-exec loop.
"""

from __future__ import annotations

import os
import sys
import time
import traceback

TRANSIENT_MARKERS = (
    "RESOURCE_EXHAUSTED",
    "UNAVAILABLE",
    "Aborted",
    "ABORTED",
    "DEADLINE_EXCEEDED",
)

# The axon chip is SINGLE-TENANT and contention is catastrophic, not
# graceful: a second client's backend init can hang indefinitely and can
# wedge the tunnel server-side (measured; see ARCHITECTURE.md "Tunnel
# notes"). Every chip entrypoint serializes on this advisory lock.
CHIP_LOCK_PATH = "/tmp/deep_carto_chip.lock"
_CHIP_LOCK_FD_ENV = "_DC_CHIP_LOCK_FD"


def acquire_chip_lock(tag: str = "bench", blocking: bool = True):
    """Exclusive advisory lock over the single-tenant chip.

    Returns the lock fd (held until process exit), or None when
    ``blocking=False`` and another process holds it. The fd is marked
    inheritable and its number is carried in the environment so
    run_with_recovery's os.execv re-executions KEEP the lock instead of
    deadlocking against their own previous open file description (flock
    is per open-file-description, not per process).
    """
    import fcntl

    inherited = os.environ.get(_CHIP_LOCK_FD_ENV)
    if inherited:
        try:
            fd = int(inherited)
            os.fstat(fd)
            return fd  # still held across execv
        except (ValueError, OSError):
            pass
    fd = os.open(CHIP_LOCK_PATH, os.O_RDWR | os.O_CREAT, 0o666)
    os.set_inheritable(fd, True)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
    except OSError:
        if not blocking:
            os.close(fd)
            return None
        try:
            with open(CHIP_LOCK_PATH) as fh:
                holder = fh.read(64).strip() or "?"
        except OSError:
            holder = "?"
        print(
            f"[{tag}] chip lock held by {holder}; waiting for it to "
            "finish (single-tenant chip — overlapping clients wedge the "
            "tunnel)...",
            file=sys.stderr,
            flush=True,
        )
        fcntl.flock(fd, fcntl.LOCK_EX)
    os.ftruncate(fd, 0)
    os.lseek(fd, 0, os.SEEK_SET)
    os.write(fd, f"pid {os.getpid()} ({tag})".encode())
    os.environ[_CHIP_LOCK_FD_ENV] = str(fd)
    return fd


def _release(exc: BaseException) -> None:
    """Drop the traceback's frame references BEFORE sleeping: they pin
    every device array of the failed attempt, keeping the remote garbage
    alive through the cool-down the sleep exists to provide."""
    traceback.clear_frames(exc.__traceback__)


def run_with_recovery(
    main,
    script_path: str,
    env_key: str,
    max_attempts: int = 4,
    cooldown_s: int = 240,
    quick_retry_s: int = 10,
    tag: str = "bench",
) -> None:
    """Run main() with transient-failure recovery (see module docstring).

    env_key carries the attempt counter across os.execv re-executions.
    """
    acquire_chip_lock(tag)  # serialize on the single-tenant chip
    attempt = int(os.environ.get(env_key, "0"))
    try:
        main()
        return
    except Exception as exc:
        err = str(exc)
        transient = any(m in err for m in TRANSIENT_MARKERS)
        if not transient or attempt >= max_attempts - 1:
            raise
        if "RESOURCE_EXHAUSTED" not in err:
            print(
                f"[{tag}] transient failure ({err[:200]}); quick retry in "
                f"{quick_retry_s}s",
                file=sys.stderr,
                flush=True,
            )
            _release(exc)
            del exc
            time.sleep(quick_retry_s)
            try:
                main()
                return
            except Exception as exc2:
                err = str(exc2)
                if not any(m in err for m in TRANSIENT_MARKERS):
                    raise
                exc = exc2
        print(
            f"[{tag}] attempt {attempt + 1} failed ({err[:200]}); "
            f"re-exec fresh process in {cooldown_s}s",
            file=sys.stderr,
            flush=True,
        )
        _release(exc)
        del exc
        time.sleep(cooldown_s)
        os.environ[env_key] = str(attempt + 1)
        os.execv(sys.executable, [sys.executable, os.path.abspath(script_path)])
