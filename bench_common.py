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

Chip-lock contract (round 5 — the driver must never be starved):

- acquire is ALWAYS bounded (default ``DC_CHIP_LOCK_TIMEOUT_S`` = 600 s);
  expiry raises :class:`ChipLockUnavailable` with the holder's identity.
- the lock file carries a heartbeat (``pid N (tag) hb TS``) refreshed at
  stage boundaries via :func:`refresh_chip_heartbeat`. A waiter that sees
  a live holder whose heartbeat is older than ``DC_CHIP_HEARTBEAT_STALE_S``
  (default 900 s — i.e. wedged in a backend-init hang, which blocks the
  holder's main thread so it CANNOT refresh) fails fast with that
  diagnosis instead of burning its own timeout.
- :func:`run_with_recovery` RELEASES the lock across its cool-down sleeps
  and re-exec boundary, so a recovering bench cannot hold the chip hostage
  while it sleeps; it re-acquires (bounded) afterwards.
- on any ChipLockUnavailable, run_with_recovery prints ONE diagnostic
  JSON line (the bench output contract) and exits nonzero — never a
  silent hang into the driver's timeout.
"""

from __future__ import annotations

import json
import os
import re
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
_CHIP_LOCK_TAG_ENV = "_DC_CHIP_LOCK_TAG"
_POLL_S = 5.0


def _lock_wait_timeout_s() -> float:
    return float(os.environ.get("DC_CHIP_LOCK_TIMEOUT_S", 600))


def _heartbeat_stale_s() -> float:
    return float(os.environ.get("DC_CHIP_HEARTBEAT_STALE_S", 900))


class ChipLockUnavailable(RuntimeError):
    """The chip lock could not be acquired within the bounded wait, or the
    holder's heartbeat is stale (holder alive but wedged)."""

    def __init__(self, reason: str, holder: str = "?"):
        self.holder = holder
        super().__init__(reason)


def _read_holder():
    """(holder_text, heartbeat_age_s or None) from the lock file."""
    try:
        with open(CHIP_LOCK_PATH) as fh:
            text = fh.read(256).strip() or "?"
    except OSError:
        return "?", None
    age = None
    m = re.search(r"\bhb (\d+(?:\.\d+)?)", text)
    # reject corrupted/absurd timestamps (> 1 day in the future) instead of
    # letting them read as a forever-fresh heartbeat
    if m and float(m.group(1)) <= time.time() + 86400:
        age = max(time.time() - float(m.group(1)), 0.0)
    else:
        try:  # legacy format: fall back to the file mtime
            age = max(time.time() - os.stat(CHIP_LOCK_PATH).st_mtime, 0.0)
        except OSError:
            pass
    return text, age


def _write_holder(fd: int, tag: str) -> None:
    # pwrite at offset 0 THEN truncate to the new length: no empty-file
    # window, and a reader can never see old-tail bytes appended to the new
    # text (a merged `hb <ts><ts>` was observed in round 5 — it parses as an
    # absurd future timestamp and silently defeats stale-holder detection).
    data = f"pid {os.getpid()} ({tag}) hb {time.time():.0f}\n".encode()
    os.pwrite(fd, data, 0)
    os.ftruncate(fd, len(data))


def refresh_chip_heartbeat() -> None:
    """Re-stamp the heartbeat on the held lock. Call at stage boundaries;
    a holder wedged in a backend-init hang cannot call this (blocked main
    thread), which is exactly what lets waiters detect the wedge."""
    inherited = os.environ.get(_CHIP_LOCK_FD_ENV)
    if not inherited:
        return
    try:
        fd = int(inherited)
        os.fstat(fd)
        _write_holder(fd, os.environ.get(_CHIP_LOCK_TAG_ENV, "bench"))
    except (ValueError, OSError):
        pass


def acquire_chip_lock(
    tag: str = "bench", blocking: bool = True, timeout_s: float | None = None
):
    """Exclusive advisory lock over the single-tenant chip.

    Returns the lock fd (held until released or process exit), or None when
    ``blocking=False`` and another process holds it. Blocking waits are
    BOUNDED (``timeout_s``, default ``DC_CHIP_LOCK_TIMEOUT_S`` = 600 s) and
    raise :class:`ChipLockUnavailable` on expiry or when the holder's
    heartbeat is stale. The fd is marked inheritable and its number is
    carried in the environment so run_with_recovery's os.execv
    re-executions KEEP the lock instead of deadlocking against their own
    previous open file description (flock is per open-file-description,
    not per process).
    """
    import fcntl

    inherited = os.environ.get(_CHIP_LOCK_FD_ENV)
    if inherited:
        try:
            fd = int(inherited)
            os.fstat(fd)
            _write_holder(fd, tag)
            os.environ[_CHIP_LOCK_TAG_ENV] = tag
            return fd  # still held across execv
        except (ValueError, OSError):
            pass
    fd = os.open(CHIP_LOCK_PATH, os.O_RDWR | os.O_CREAT, 0o666)
    os.set_inheritable(fd, True)
    if timeout_s is None:
        timeout_s = _lock_wait_timeout_s()
    deadline = time.time() + timeout_s
    announced = False
    while True:
        try:
            fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
            break
        except OSError:
            if not blocking:
                os.close(fd)
                return None
            holder, hb_age = _read_holder()
            if hb_age is not None and hb_age > _heartbeat_stale_s():
                os.close(fd)
                raise ChipLockUnavailable(
                    f"chip lock held by {holder} with a STALE heartbeat "
                    f"({hb_age:.0f}s old > {_heartbeat_stale_s():.0f}s): the "
                    "holder is alive but wedged (typically a backend-init "
                    "hang during a service outage); failing fast instead of "
                    "waiting out the timeout",
                    holder,
                )
            if time.time() >= deadline:
                os.close(fd)
                raise ChipLockUnavailable(
                    f"chip lock held by {holder} (heartbeat "
                    f"{'%.0fs old' % hb_age if hb_age is not None else 'unknown'}); "
                    f"bounded wait of {timeout_s:.0f}s expired",
                    holder,
                )
            if not announced:
                print(
                    f"[{tag}] chip lock held by {holder}; waiting up to "
                    f"{timeout_s:.0f}s (single-tenant chip — overlapping "
                    "clients wedge the tunnel)...",
                    file=sys.stderr,
                    flush=True,
                )
                announced = True
            time.sleep(min(_POLL_S, max(deadline - time.time(), 0.1)))
    _write_holder(fd, tag)
    os.environ[_CHIP_LOCK_FD_ENV] = str(fd)
    os.environ[_CHIP_LOCK_TAG_ENV] = tag
    return fd


def release_chip_lock() -> None:
    """Drop the held chip lock (no-op if not held). run_with_recovery calls
    this before every cool-down sleep so a recovering bench never holds the
    chip hostage while sleeping."""
    import fcntl

    inherited = os.environ.pop(_CHIP_LOCK_FD_ENV, None)
    os.environ.pop(_CHIP_LOCK_TAG_ENV, None)
    if not inherited:
        return
    try:
        fd = int(inherited)
        fcntl.flock(fd, fcntl.LOCK_UN)
        os.close(fd)
    except (ValueError, OSError):
        pass


def _bench_unavailable_exit(exc: ChipLockUnavailable, tag: str) -> None:
    """The bench output contract is ONE JSON line; when the chip cannot be
    acquired, print a self-diagnosing line and exit nonzero instead of
    burning the caller's (driver's) timeout."""
    print(
        json.dumps(
            {
                "metric": f"{tag}_unavailable",
                "value": 0,
                "unit": "none",
                "vs_baseline": 0,
                "error": str(exc),
                "holder": exc.holder,
            }
        ),
        flush=True,
    )
    sys.exit(3)


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
    try:
        acquire_chip_lock(tag)  # bounded; serialize on the single-tenant chip
    except ChipLockUnavailable as exc:
        _bench_unavailable_exit(exc, tag)
    attempt = int(os.environ.get(env_key, "0"))
    try:
        main()
        return
    except Exception as exc:
        err = str(exc)
        transient = any(m in err for m in TRANSIENT_MARKERS)
        if transient and attempt >= max_attempts - 1:
            # Terminal transient failure: the bench output contract is ONE
            # JSON line — print a self-diagnosing line and exit nonzero
            # instead of dying with a bare traceback.
            print(
                json.dumps(
                    {
                        "metric": f"{tag}_failed",
                        "value": 0,
                        "unit": "none",
                        "vs_baseline": 0,
                        "error": f"transient failure persisted through "
                                 f"{max_attempts} attempts: {err[:300]}",
                    }
                ),
                flush=True,
            )
            traceback.print_exc()
            sys.exit(4)
        if not transient:
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
            refresh_chip_heartbeat()
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
        # Release the chip across the cool-down AND the re-exec: a waiter
        # (e.g. the driver's bench.py) must be able to run while this
        # process sleeps. The fresh process re-acquires (bounded) at start.
        release_chip_lock()
        time.sleep(cooldown_s)
        os.environ[env_key] = str(attempt + 1)
        os.execv(sys.executable, [sys.executable, os.path.abspath(script_path)])
