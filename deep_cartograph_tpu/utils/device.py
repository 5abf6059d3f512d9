"""Small-workload device routing.

Remote-attached accelerators pay tens-to-hundreds of seconds of compile
latency per XLA program; below a work threshold the host CPU finishes the
whole job before the accelerator could even start. Host-side entry points
(filter statistics, clustering, FES) wrap their jitted calls in
`maybe_cpu(n_elements)`: host inputs smaller than the threshold run on the
host CPU backend, everything else (and all device-resident inputs, which
dispatch by placement) uses the default backend. The featurization engine
has its own richer policy (geom/engine.py `device="auto"`).
"""

from __future__ import annotations

import contextlib

import jax

# Same scale as geom.engine._AUTO_CPU_WORK_THRESHOLD: ~seconds of CPU work.
SMALL_WORK_ELEMENTS = 5e7


def host_cpu_device():
    """The host CPU device, or None when CPU already is the default backend
    (or no CPU backend exists)."""
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        return None
    if jax.devices()[0] == cpu:
        return None
    return cpu


def maybe_cpu(n_elements: float, threshold: float = SMALL_WORK_ELEMENTS):
    """Context manager: route small host workloads to the host CPU."""
    if n_elements < threshold:
        cpu = host_cpu_device()
        if cpu is not None:
            return jax.default_device(cpu)
    return contextlib.nullcontext()


_MEASURED_UPLOAD_BW: float | None = None


def device_upload_bandwidth() -> float:
    """Measured host->device bandwidth (bytes/s) of the default backend,
    probed once per process (~8 MB transfer). Tunneled backends measure
    ~40 MB/s; PCIe hosts measure GB/s — the difference decides whether
    low-arithmetic-intensity ops should ever leave the host."""
    global _MEASURED_UPLOAD_BW
    if _MEASURED_UPLOAD_BW is None:
        import time

        import numpy as np

        try:
            probe = np.zeros(2_000_000, np.float32)  # 8 MB
            jax.device_put(probe[:1024]).block_until_ready()  # warm path
            t0 = time.time()
            arr = jax.device_put(probe)
            float(arr[-1])  # force completion via a host read
            dt = max(time.time() - t0, 1e-6)
            _MEASURED_UPLOAD_BW = probe.nbytes / dt
        except Exception:
            _MEASURED_UPLOAD_BW = float("inf")
    return _MEASURED_UPLOAD_BW


def maybe_cpu_for_host_data(
    n_elements: float,
    n_bytes: float,
    host_rate: float = 2e8,
    threshold: float = SMALL_WORK_ELEMENTS,
):
    """Routing for LOW-arithmetic-intensity ops over HOST-resident data
    (per-feature std/entropy/min-max: O(1) work per element). The device
    only wins when uploading the data costs less than just computing on
    the host — through a ~40 MB/s tunnel it never does, on PCIe it
    usually does. `host_rate`: elements/s the host implementation
    sustains for this op."""
    cpu = host_cpu_device()
    if cpu is None:
        return contextlib.nullcontext()
    if n_elements < threshold:
        return jax.default_device(cpu)
    upload_s = n_bytes / device_upload_bandwidth()
    host_s = n_elements / host_rate
    # 2x margin: the device still pays dispatch + download of results
    if upload_s > 2.0 * host_s:
        return jax.default_device(cpu)
    return contextlib.nullcontext()
