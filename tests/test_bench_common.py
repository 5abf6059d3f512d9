"""Chip-lock semantics for the bench entrypoints (single-tenant chip).

Round-5 contract (VERDICT r04 items 1b/1c/6): blocking acquires are
bounded, the lock file carries a heartbeat, waiters fail fast on a stale
holder, recovery sleeps release the lock, and an unacquirable chip makes
run_with_recovery print one diagnostic JSON line and exit nonzero.
"""

import json
import os
import subprocess
import sys
import textwrap
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(code: str, env=None) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "-c", textwrap.dedent(code)],
        capture_output=True, text=True, timeout=60,
        env={**os.environ, "PYTHONPATH": REPO, **(env or {})},
    )


def _holder(tmp_path, extra: str = "") -> subprocess.Popen:
    """A process that acquires the lock, prints 'held', then sleeps."""
    proc = subprocess.Popen(
        [sys.executable, "-c", textwrap.dedent(f"""
            import sys, time
            sys.path.insert(0, {REPO!r})
            import bench_common
            bench_common.CHIP_LOCK_PATH = {str(tmp_path / 'chip.lock')!r}
            bench_common.acquire_chip_lock("holder")
            {extra}
            print("held", flush=True)
            time.sleep(30)
        """)],
        stdout=subprocess.PIPE, text=True,
    )
    assert proc.stdout.readline().strip() == "held"
    return proc


def test_chip_lock_excludes_second_process(tmp_path):
    hold = _holder(tmp_path)
    try:
        out = _run(f"""
            import sys
            sys.path.insert(0, {REPO!r})
            import bench_common
            bench_common.CHIP_LOCK_PATH = {str(tmp_path / 'chip.lock')!r}
            print(bench_common.acquire_chip_lock("probe", blocking=False))
        """)
        assert out.stdout.strip() == "None", (out.stdout, out.stderr)
    finally:
        hold.kill()
        hold.wait()
    # released on process death: nonblocking acquire now succeeds
    out = _run(f"""
        import sys
        sys.path.insert(0, {REPO!r})
        import bench_common
        bench_common.CHIP_LOCK_PATH = {str(tmp_path / 'chip.lock')!r}
        print(bench_common.acquire_chip_lock("probe2", blocking=False))
    """)
    assert out.stdout.strip() != "None", (out.stdout, out.stderr)


def test_chip_lock_survives_reacquire_in_same_process(tmp_path):
    """run_with_recovery re-execs the script; the env-carried fd must
    short-circuit re-acquisition (a second flock on a fresh fd of the
    same file would deadlock the process against itself)."""
    out = _run(f"""
        import sys
        sys.path.insert(0, {REPO!r})
        import bench_common
        bench_common.CHIP_LOCK_PATH = {str(tmp_path / 'chip.lock')!r}
        fd1 = bench_common.acquire_chip_lock("t")
        fd2 = bench_common.acquire_chip_lock("t")
        assert fd1 == fd2, (fd1, fd2)
        print("ok")
    """)
    assert "ok" in out.stdout, (out.stdout, out.stderr)


def test_blocking_acquire_is_bounded(tmp_path):
    """A waiter against a healthy holder raises ChipLockUnavailable once
    its bounded wait expires — never an unbounded flock."""
    hold = _holder(tmp_path)
    try:
        t0 = time.time()
        out = _run(f"""
            import sys
            sys.path.insert(0, {REPO!r})
            import bench_common
            bench_common.CHIP_LOCK_PATH = {str(tmp_path / 'chip.lock')!r}
            try:
                bench_common.acquire_chip_lock("waiter", timeout_s=2)
            except bench_common.ChipLockUnavailable as exc:
                print("UNAVAILABLE:", exc)
        """)
        elapsed = time.time() - t0
        assert "UNAVAILABLE:" in out.stdout, (out.stdout, out.stderr)
        assert "(holder)" in out.stdout  # diagnosis names the holder
        assert elapsed < 30, elapsed
    finally:
        hold.kill()
        hold.wait()


def test_stale_heartbeat_fails_fast(tmp_path):
    """A live holder whose heartbeat is older than the stale threshold is
    a wedged holder (backend-init hang): waiters diagnose it immediately
    instead of burning their own timeout."""
    hold = _holder(tmp_path)
    try:
        # Forge a 2h-old heartbeat in the lock file (the holder wedged in
        # backend init cannot refresh it — that is the detection signal).
        stale_ts = int(time.time()) - 7200
        lock = tmp_path / "chip.lock"
        lock.write_text(f"pid {hold.pid} (holder) hb {stale_ts}")
        t0 = time.time()
        out = _run(f"""
            import sys
            sys.path.insert(0, {REPO!r})
            import bench_common
            bench_common.CHIP_LOCK_PATH = {str(tmp_path / 'chip.lock')!r}
            try:
                bench_common.acquire_chip_lock("waiter", timeout_s=300)
            except bench_common.ChipLockUnavailable as exc:
                print("STALE-DETECTED:", exc)
        """)
        assert "STALE-DETECTED:" in out.stdout, (out.stdout, out.stderr)
        assert "STALE heartbeat" in out.stdout
        assert time.time() - t0 < 30  # fail-fast, not the 300s timeout
    finally:
        hold.kill()
        hold.wait()


def test_heartbeat_refresh_updates_timestamp(tmp_path):
    out = _run(f"""
        import os, re, sys, time
        sys.path.insert(0, {REPO!r})
        import bench_common
        bench_common.CHIP_LOCK_PATH = {str(tmp_path / 'chip.lock')!r}
        bench_common.acquire_chip_lock("t")
        first = open(bench_common.CHIP_LOCK_PATH).read()
        hb1 = float(re.search(r"hb (\\d+)", first).group(1))
        time.sleep(1.1)
        bench_common.refresh_chip_heartbeat()
        second = open(bench_common.CHIP_LOCK_PATH).read()
        hb2 = float(re.search(r"hb (\\d+)", second).group(1))
        assert hb2 > hb1, (first, second)
        print("ok")
    """)
    assert "ok" in out.stdout, (out.stdout, out.stderr)


def test_release_chip_lock_frees_waiters(tmp_path):
    """release_chip_lock (called across recovery cool-down sleeps) must
    let another process acquire immediately."""
    out = _run(f"""
        import os, subprocess, sys
        sys.path.insert(0, {REPO!r})
        import bench_common
        bench_common.CHIP_LOCK_PATH = {str(tmp_path / 'chip.lock')!r}
        bench_common.acquire_chip_lock("t")
        bench_common.release_chip_lock()
        probe = subprocess.run(
            [sys.executable, "-c",
             "import sys; sys.path.insert(0, {REPO!r}); "
             "import bench_common; "
             "bench_common.CHIP_LOCK_PATH = "
             + repr({str(tmp_path / 'chip.lock')!r}) +
             "; print(bench_common.acquire_chip_lock('p', blocking=False))"],
            capture_output=True, text=True,
        )
        assert probe.stdout.strip() != "None", probe.stdout
        # and release is idempotent / env is cleared
        assert os.environ.get("_DC_CHIP_LOCK_FD") is None
        bench_common.release_chip_lock()
        print("ok")
    """)
    assert "ok" in out.stdout, (out.stdout, out.stderr)


def test_run_with_recovery_prints_diagnostic_json_on_busy_chip(tmp_path):
    """The driver contract: if the chip cannot be acquired, the bench must
    still print ONE JSON line (self-diagnosing) and exit nonzero — never
    sit silently in a lock queue until the driver's timeout."""
    hold = _holder(tmp_path)
    try:
        out = _run(
            f"""
            import sys
            sys.path.insert(0, {REPO!r})
            import bench_common
            bench_common.CHIP_LOCK_PATH = {str(tmp_path / 'chip.lock')!r}
            bench_common.run_with_recovery(
                lambda: None, "/tmp/bench_stub.py", "TEST_ATTEMPT",
                tag="bench")
            """,
            env={"DC_CHIP_LOCK_TIMEOUT_S": "2"},
        )
        assert out.returncode == 3, (out.returncode, out.stdout, out.stderr)
        line = json.loads(out.stdout.strip().splitlines()[-1])
        assert line["metric"] == "bench_unavailable"
        assert line["vs_baseline"] == 0
        assert "chip lock held by" in line["error"]
    finally:
        hold.kill()
        hold.wait()


def test_corrupted_future_heartbeat_reads_as_unknown(tmp_path):
    """A merged/absurd `hb` timestamp (observed in round 5: two stamps
    concatenated) must NOT read as a forever-fresh heartbeat; the parser
    falls back to the file mtime so stale detection still works."""
    import bench_common

    lock = tmp_path / "chip.lock"
    lock.write_text("pid 999 (config5) hb 17870397621787039787")
    old = time.time() - 5000
    os.utime(lock, (old, old))
    orig = bench_common.CHIP_LOCK_PATH
    bench_common.CHIP_LOCK_PATH = str(lock)
    try:
        text, age = bench_common._read_holder()
        assert "pid 999" in text
        # mtime fallback: ~5000s old, nowhere near the bogus stamp's 0s
        assert age is not None and age > 4000
    finally:
        bench_common.CHIP_LOCK_PATH = orig


def test_write_holder_truncates_previous_longer_text(tmp_path):
    """pwrite+truncate: a shorter rewrite leaves no tail bytes behind."""
    import bench_common

    lock = tmp_path / "chip.lock"
    fd = os.open(str(lock), os.O_RDWR | os.O_CREAT)
    try:
        os.pwrite(fd, b"x" * 200, 0)
        bench_common._write_holder(fd, "t")
        text = lock.read_text()
        assert text.startswith(f"pid {os.getpid()} (t) hb ")
        assert "x" not in text
    finally:
        os.close(fd)


def test_run_with_recovery_terminal_transient_prints_json(tmp_path):
    """Exhausted re-exec attempts on a transient error must still honor
    the one-JSON-line bench contract (exit 4, metric <tag>_failed)."""
    out = _run(f"""
        import sys
        sys.path.insert(0, {REPO!r})
        import bench_common
        bench_common.CHIP_LOCK_PATH = {str(tmp_path / 'chip.lock')!r}

        def boom():
            raise RuntimeError("RESOURCE_EXHAUSTED: synthetic")

        bench_common.run_with_recovery(
            boom, "unused.py", "T_ATTEMPT", max_attempts=1, tag="t")
    """)
    assert out.returncode == 4, (out.returncode, out.stdout, out.stderr)
    line = json.loads(out.stdout.strip().splitlines()[-1])
    assert line["metric"] == "t_failed"
    assert line["vs_baseline"] == 0
    assert "RESOURCE_EXHAUSTED" in line["error"]
