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
