"""The TPU featurization engine: trajectory -> feature matrix.

This is the replacement for the reference's PLUMED-driver subprocess hot loop
(deep_cartograph/tools/compute_features/compute_features.py:152-221 +
modules/plumed/cli.py:85-163): frames are decoded on the host in chunks,
streamed to device HBM, and every feature of every frame in the chunk is
evaluated by one jitted XLA program (see geom/kernels.py). Chunks have a
fixed padded shape so the program compiles exactly once per
(feature list, topology).
"""

from __future__ import annotations

import logging
import os
import time
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from deep_cartograph_tpu.features.grammar import compile_plan
from deep_cartograph_tpu.geom.kernels import PlanEvaluator
from deep_cartograph_tpu.io.topology import Topology
from deep_cartograph_tpu.io.traj import iter_frame_chunks

logger = logging.getLogger(__name__)

# Soft budget for per-chunk intermediates on device (bytes).
_CHUNK_BYTE_BUDGET = 1 << 30


def auto_chunk_size(requested: int, n_atoms: int, n_features: int) -> int:
    """Clamp the frame-chunk size so per-chunk intermediates stay in budget."""
    bytes_per_frame = 4 * (12 * n_atoms + 16 * max(n_features, 1))
    max_frames = max(64, _CHUNK_BYTE_BUDGET // max(bytes_per_frame, 1))
    return int(max(1, min(requested, max_frames)))


class Featurizer:
    """Featurization of frame batches for one (feature list, topology) pair."""

    def __init__(
        self,
        topology: Topology,
        features_list: List[str],
        fit_template: Optional[Tuple[np.ndarray, np.ndarray]] = None,
        dtype=None,
        device: str = "default",
    ):
        """fit_template: optional (reference_positions, align_weights) applied
        before coordinate features (PLUMED FIT_TO_TEMPLATE equivalent).

        `device`: "default" compiles for the default backend; "cpu" pins the
        plan to the host CPU; "auto" picks the host CPU for small trajectories
        where a remote accelerator's per-program compile latency (tens to
        hundreds of seconds) would dwarf the compute, and the accelerator
        otherwise."""
        import jax.numpy as jnp

        self.topology = topology
        self.features_list = list(features_list)
        self.plan = compile_plan(self.features_list, topology)
        ref, weights = (None, None) if fit_template is None else fit_template
        if self.plan.needs_fit and ref is None:
            raise ValueError(
                "Features contain coordinates but no fit template was provided."
            )
        self.device_policy = device
        self._dtype = dtype or jnp.float32
        self._fit = (
            ref if self.plan.needs_fit else None,
            weights if self.plan.needs_fit else None,
        )
        self._evaluators: dict = {}

    @property
    def evaluator(self) -> PlanEvaluator:
        """Default-backend evaluator (sharded/deploy callers)."""
        return self._get_evaluator(None)

    def _get_evaluator(self, device) -> PlanEvaluator:
        key = None if device is None else str(device)
        if key not in self._evaluators:
            self._evaluators[key] = PlanEvaluator(
                self.plan,
                fit_reference=self._fit[0],
                fit_weights=self._fit[1],
                dtype=self._dtype,
                device=device,
            )
        return self._evaluators[key]

    def _host_cpu_device(self):
        import jax

        try:
            cpu = jax.devices("cpu")[0]
        except RuntimeError:
            return None
        if jax.devices()[0] == cpu:
            return None  # CPU already is the default backend
        return cpu

    # Below this estimated element-op count the host CPU finishes the whole
    # job faster than a remote accelerator can even compile the program.
    _AUTO_CPU_WORK_THRESHOLD = 5e8

    def _pick_device(self, trajectory_path: str, traj_stride: int):
        if self.device_policy == "cpu":
            return self._host_cpu_device()
        if self.device_policy != "auto":
            return None
        cpu = self._host_cpu_device()
        if cpu is None:
            return None
        # File size bounds the frame count for every supported format
        # (>= ~4 bytes per atom per frame), cheap and header-free.
        est_frames = os.path.getsize(trajectory_path) / max(
            4 * self.topology.n_atoms * max(traj_stride, 1), 1
        )
        work = est_frames * self.topology.n_atoms * max(self.plan.n_features, 1)
        if work < self._AUTO_CPU_WORK_THRESHOLD:
            logger.info(
                "Small featurization workload (~%d frames); running on the "
                "host CPU to skip accelerator compile latency.",
                est_frames,
            )
            return cpu
        return None

    def __call__(self, coords: np.ndarray) -> np.ndarray:
        device = None
        if self.device_policy == "cpu":
            device = self._host_cpu_device()
        elif self.device_policy == "auto":
            work = float(np.asarray(coords).shape[0]) * self.topology.n_atoms \
                * max(self.plan.n_features, 1)
            if work < self._AUTO_CPU_WORK_THRESHOLD:
                device = self._host_cpu_device()
        return self._get_evaluator(device)(coords)

    def featurize_trajectory(
        self,
        trajectory_path: str,
        traj_stride: int = 1,
        frame_chunk: int = 2048,
        timeout: Optional[float] = None,
    ) -> np.ndarray:
        """Stream a trajectory through the device in fixed-shape chunks.

        Returns the (n_frames, n_features) matrix (nm / radians). `timeout`
        (seconds) bounds the wall clock like the reference's PLUMED
        subprocess timeout (cf. reference cli.py:89).
        """
        chunk = auto_chunk_size(
            frame_chunk, self.topology.n_atoms, self.plan.n_features
        )
        evaluator = self._get_evaluator(
            self._pick_device(trajectory_path, traj_stride)
        )
        outputs: List[np.ndarray] = []
        t0 = time.time()
        n_frames = 0
        for block in iter_frame_chunks(
            trajectory_path, chunk, self.topology.source_path, stride=traj_stride
        ):
            if timeout is not None and time.time() - t0 > timeout:
                raise TimeoutError(
                    f"Featurization exceeded the configured timeout of "
                    f"{timeout} s after {n_frames} frames."
                )
            n = block.shape[0]
            n_frames += n
            if n < chunk:
                # Pad to the static chunk shape; one XLA program for all chunks.
                pad = np.repeat(block[-1:], chunk - n, axis=0)
                block = np.concatenate([block, pad], axis=0)
            # Async dispatch: keep device arrays so host decode of the next
            # chunk overlaps device compute; download once at the end.
            outputs.append((evaluator.eval_raw(block), n))
        result = np.concatenate(
            [np.asarray(out)[:n] for out, n in outputs], axis=0
        )
        dt = time.time() - t0
        logger.info(
            "Featurized %d frames x %d features in %.2fs (%.0f frames/s)",
            n_frames,
            self.plan.n_features,
            dt,
            n_frames / max(dt, 1e-9),
        )
        return result


    def featurize_trajectories(
        self,
        trajectory_paths: List[str],
        traj_stride: int = 1,
        frame_chunk: int = 2048,
        timeout: Optional[float] = None,
    ) -> List[np.ndarray]:
        """Stream N same-topology trajectories through SHARED fixed-shape
        chunks: a chunk may span a trajectory seam, so the whole batch runs
        through one compiled XLA program with at most one padded chunk total
        (the reference loops serially per trajectory,
        compute_features.py:152). Returns one (n_frames_i, n_features)
        matrix per trajectory."""
        chunk = auto_chunk_size(
            frame_chunk, self.topology.n_atoms, self.plan.n_features
        )
        # Device policy from the combined workload of the whole batch
        total_bytes = sum(os.path.getsize(p) for p in trajectory_paths)
        est_frames = total_bytes / max(
            4 * self.topology.n_atoms * max(traj_stride, 1), 1
        )
        device = None
        if self.device_policy == "cpu":
            device = self._host_cpu_device()
        elif self.device_policy == "auto":
            work = est_frames * self.topology.n_atoms * max(
                self.plan.n_features, 1
            )
            if work < self._AUTO_CPU_WORK_THRESHOLD:
                device = self._host_cpu_device()
        evaluator = self._get_evaluator(device)

        buf = np.empty((chunk, self.topology.n_atoms, 3), np.float32)
        fill = 0
        outputs: List[Tuple] = []
        lengths: List[int] = []
        t0 = time.time()
        for path in trajectory_paths:
            count = 0
            for block in iter_frame_chunks(
                path, chunk, self.topology.source_path, stride=traj_stride
            ):
                if timeout is not None and time.time() - t0 > timeout:
                    raise TimeoutError(
                        f"Featurization exceeded the configured timeout of "
                        f"{timeout} s."
                    )
                count += block.shape[0]
                pos = 0
                while pos < block.shape[0]:
                    take = min(chunk - fill, block.shape[0] - pos)
                    buf[fill : fill + take] = block[pos : pos + take]
                    fill += take
                    pos += take
                    if fill == chunk:
                        outputs.append((evaluator.eval_raw(buf.copy()), chunk))
                        fill = 0
            lengths.append(count)
        if fill:
            buf[fill:] = buf[fill - 1 : fill]
            outputs.append((evaluator.eval_raw(buf.copy()), fill))
        flat = np.concatenate(
            [np.asarray(out)[:n] for out, n in outputs], axis=0
        ) if outputs else np.zeros((0, self.plan.n_features), np.float32)
        results = []
        offset = 0
        for n in lengths:
            results.append(flat[offset : offset + n])
            offset += n
        dt = time.time() - t0
        logger.info(
            "Featurized %d trajectories (%d frames x %d features) in %.2fs "
            "through shared chunks (%.0f frames/s)",
            len(trajectory_paths),
            offset,
            self.plan.n_features,
            dt,
            offset / max(dt, 1e-9),
        )
        return results

    def featurize_frames_sharded(self, coords: np.ndarray, mesh=None):
        """Featurize a frame batch with the frame axis sharded over the mesh.

        Each device evaluates its shard of frames through the same compiled
        plan; the output stays frame-sharded on device (callers psum/reduce
        or gather as needed). This is the pod-scale path (SURVEY §2.5
        'sequence parallelism' = frame-axis sharding).
        """
        import jax

        from deep_cartograph_tpu.parallel.mesh import (
            frame_sharding,
            get_mesh,
            pad_to_multiple,
        )

        mesh = mesh or get_mesh()
        n_dev = mesh.devices.size
        padded, n = pad_to_multiple(np.asarray(coords, np.float32), n_dev)
        sharding = frame_sharding(mesh)
        frames_d = jax.device_put(padded, sharding)
        out = jax.jit(self.evaluator.device_fn(), out_shardings=sharding)(
            frames_d
        )
        return out, n


def featurize_trajectory(
    trajectory_path: str,
    topology_path: str,
    features_list: List[str],
    traj_stride: int = 1,
    frame_chunk: int = 2048,
    fit_template_path: Optional[str] = None,
    device: str = "auto",
) -> np.ndarray:
    """One-shot helper: decode + featurize a whole trajectory."""
    topology = Topology.from_file(topology_path)
    fit_template = None
    if fit_template_path is not None:
        template = Topology.from_file(fit_template_path)
        fit_template = (template.positions, template.occupancies)
    featurizer = Featurizer(topology, features_list, fit_template, device=device)
    return featurizer.featurize_trajectory(trajectory_path, traj_stride, frame_chunk)
