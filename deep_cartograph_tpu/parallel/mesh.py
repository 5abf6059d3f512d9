"""Device mesh management.

The reference has no distributed runtime (SURVEY §2.5); here scaling is
expressed through jax.sharding over a Mesh: the frame axis shards across
devices for featurization / covariance / KDE / clustering, and the batch axis
for deep-CV training. XLA inserts the collectives (psum over ICI).
"""

from __future__ import annotations

import logging
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)

FRAME_AXIS = "frames"


def get_mesh(n_devices: Optional[int] = None, axis_name: str = FRAME_AXIS) -> Mesh:
    """A 1-D mesh over (up to) all local devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def frame_sharding(mesh: Mesh, axis_name: str = FRAME_AXIS) -> NamedSharding:
    """Shard the leading (frame/sample) axis; replicate the rest."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(
    array: np.ndarray, multiple: int, axis: int = 0
) -> Tuple[np.ndarray, int]:
    """Edge-pad along axis to a multiple (static shapes for pjit); returns
    (padded, original_length)."""
    n = array.shape[axis]
    remainder = n % multiple
    if remainder == 0:
        return array, n
    pad = multiple - remainder
    pad_block = np.take(array, [-1] * pad, axis=axis)
    return np.concatenate([array, pad_block], axis=axis), n


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host initialization for pods (DCN-spanning).

    No-op when single-process; on a pod, call before building meshes so
    jax.devices() spans all hosts.
    """
    if num_processes is None or num_processes <= 1:
        logger.debug("Single-process run; skipping jax.distributed init.")
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def local_shard(items: Sequence, process_id: Optional[int] = None,
                num_processes: Optional[int] = None) -> list:
    """Partition a work list (trajectory paths, colvars files) across pod
    hosts: host i takes items [i::num_processes]. Single-process runs get
    the whole list. This is the DCN-spanning data-loading split (SURVEY §5):
    each host decodes only its own trajectories; frame shards then meet on
    the mesh through device_put + collectives.
    """
    pid = jax.process_index() if process_id is None else process_id
    nproc = jax.process_count() if num_processes is None else num_processes
    if nproc <= 1:
        return list(items)
    return list(items)[pid::nproc]
