"""Chip-lock semantics for the bench entrypoints (single-tenant chip)."""

import os
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(code: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "-c", textwrap.dedent(code)],
        capture_output=True, text=True, timeout=60,
        env={**os.environ, "PYTHONPATH": REPO},
    )


def test_chip_lock_excludes_second_process(tmp_path):
    hold = subprocess.Popen(
        [sys.executable, "-c", textwrap.dedent(f"""
            import sys, time
            sys.path.insert(0, {REPO!r})
            import bench_common
            bench_common.CHIP_LOCK_PATH = {str(tmp_path / 'chip.lock')!r}
            bench_common.acquire_chip_lock("holder")
            print("held", flush=True)
            time.sleep(30)
        """)],
        stdout=subprocess.PIPE, text=True,
    )
    try:
        assert hold.stdout.readline().strip() == "held"
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
