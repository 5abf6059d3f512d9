"""Profiling and per-stage timing.

The reference only logs coarse wall-clock deltas per step (SURVEY §5
tracing); here the same timing log format is kept, plus opt-in JAX device
profiling: set DEEP_CARTO_PROFILE_DIR to capture an XLA trace for any stage
(viewable in TensorBoard / Perfetto).
"""

from __future__ import annotations

import contextlib
import logging
import os
import time
from typing import Iterator, Optional

logger = logging.getLogger(__name__)

PROFILE_ENV = "DEEP_CARTO_PROFILE_DIR"


@contextlib.contextmanager
def stage_timer(stage_name: str) -> Iterator[None]:
    """Wall-clock a pipeline stage in the reference's log format, and wrap it
    in a jax.profiler trace when DEEP_CARTO_PROFILE_DIR is set."""
    profile_dir = os.environ.get(PROFILE_ENV)
    start = time.time()
    ctx: Optional[object] = None
    if profile_dir:
        import jax

        trace_dir = os.path.join(profile_dir, stage_name.replace(" ", "_"))
        ctx = jax.profiler.trace(trace_dir)
        ctx.__enter__()
    try:
        yield
    finally:
        if ctx is not None:
            ctx.__exit__(None, None, None)
        elapsed = time.time() - start
        logger.info(
            "Elapsed time (%s): %s",
            stage_name,
            time.strftime("%H h %M min %S s", time.gmtime(elapsed)),
        )


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region inside a device trace (jax.profiler.TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def maybe_trace(stage_name: str) -> Iterator[None]:
    """Capture an XLA device trace for a pipeline stage when
    DEEP_CARTO_PROFILE_DIR is set; no-op (and no logging) otherwise."""
    profile_dir = os.environ.get(PROFILE_ENV)
    if not profile_dir:
        yield
        return
    import jax

    trace_dir = os.path.join(profile_dir, stage_name.replace(" ", "_"))
    with jax.profiler.trace(trace_dir):
        yield


def traced(stage_name: str):
    """Decorator form of maybe_trace for tool entry points."""
    import functools

    def decorate(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            with maybe_trace(stage_name):
                return fn(*args, **kwargs)

        return wrapper

    return decorate
