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

    def _get_evaluator(self, device):
        key = None if device is None else str(device)
        if key is None and self._default_backend_devices() > 1:
            # Multi-chip backend: shard the frame axis of every chunk over
            # all devices automatically (SURVEY §2.5 frame-axis parallelism)
            # — the tools use the whole mesh without configuration.
            key = "sharded"
            if key not in self._evaluators:
                self._evaluators[key] = ShardedChunkEvaluator(
                    PlanEvaluator(
                        self.plan,
                        fit_reference=self._fit[0],
                        fit_weights=self._fit[1],
                        dtype=self._dtype,
                        device=None,
                    )
                )
            return self._evaluators[key]
        if key not in self._evaluators:
            self._evaluators[key] = PlanEvaluator(
                self.plan,
                fit_reference=self._fit[0],
                fit_weights=self._fit[1],
                dtype=self._dtype,
                device=device,
            )
        return self._evaluators[key]

    @staticmethod
    def _default_backend_devices() -> int:
        import jax

        try:
            return len(jax.devices())
        except RuntimeError:
            return 1

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
        return self._pick_device_for_bytes(
            os.path.getsize(trajectory_path), traj_stride
        )

    def _pick_device_for_bytes(self, total_bytes: float, traj_stride: int):
        """Device policy from a workload size in trajectory-file bytes
        (one trajectory or a whole same-topology group)."""
        if self.device_policy == "cpu":
            return self._host_cpu_device()
        if self.device_policy != "auto":
            return None
        cpu = self._host_cpu_device()
        if cpu is None:
            return None
        # File size bounds the frame count for every supported format
        # (>= ~4 bytes per atom per frame), cheap and header-free.
        est_frames = total_bytes / max(
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
        upload: str = "auto",
    ) -> np.ndarray:
        """Stream a trajectory through the device in fixed-shape chunks.

        Returns the (n_frames, n_features) matrix (nm / radians). `timeout`
        (seconds) bounds the wall clock like the reference's PLUMED
        subprocess timeout (cf. reference cli.py:89). `upload` picks the
        host->device transport: "float32" (exact), "int16" (fixed-point,
        half the bytes, XTC-precision-class — io/upload.py), or "auto"
        (DC_TPU_UPLOAD env, default float32).
        """
        from deep_cartograph_tpu.io.upload import resolve_upload_mode

        upload_mode = resolve_upload_mode(upload)
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
            if upload_mode == "int16":
                outputs.append((_eval_quantized(evaluator, block), n))
            else:
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
        """Batch form of iter_featurize_trajectories (original order)."""
        return [
            feats
            for _, feats in self.iter_featurize_trajectories(
                trajectory_paths, traj_stride, frame_chunk, timeout
            )
        ]

    def iter_featurize_trajectories(
        self,
        trajectory_paths: List[str],
        traj_stride: int = 1,
        frame_chunk: int = 2048,
        timeout: Optional[float] = None,
    ):
        """Stream N same-topology trajectories through SHARED fixed-shape
        chunks — a chunk may span a trajectory seam, so the whole batch runs
        through ONE compiled XLA program with at most one padded chunk total
        (the reference loops serially per trajectory,
        compute_features.py:152).

        Yields (path, (n_frames_i, n_features) matrix) per trajectory AS
        SOON as its last frame has been evaluated (delayed by at most one
        chunk), so callers can persist each result incrementally and memory
        stays bounded: at most `pipeline_depth` chunk outputs live on
        device, and host buffers hold one trajectory's features plus one
        chunk. `timeout` (seconds) applies PER TRAJECTORY, like the
        reference's per-driver-run PLUMED timeout (cli.py:89).
        """
        from collections import deque

        chunk = auto_chunk_size(
            frame_chunk, self.topology.n_atoms, self.plan.n_features
        )
        # Device policy from the combined workload of the whole batch
        evaluator = self._get_evaluator(
            self._pick_device_for_bytes(
                sum(os.path.getsize(p) for p in trajectory_paths), traj_stride
            )
        )
        n_feat = self.plan.n_features
        pipeline_depth = 2

        buf = np.empty((chunk, self.topology.n_atoms, 3), np.float32)
        fill = 0
        pending: deque = deque()   # (device_out, n_valid) awaiting download
        host_parts: List[np.ndarray] = []
        host_avail = 0             # frames currently in host_parts
        dispatched = 0             # frames sent to the device so far
        consumed = 0               # frames already emitted to trajectories
        finished: deque = deque()  # (path, end_offset)
        t_start = time.time()

        def flush_oldest():
            nonlocal host_avail
            out, n = pending.popleft()
            host_parts.append(np.asarray(out)[:n])
            host_avail += n

        def dispatch():
            nonlocal fill, dispatched
            pending.append((evaluator.eval_raw(buf.copy()), fill))
            dispatched += fill
            fill = 0
            while len(pending) > pipeline_depth:
                flush_oldest()

        def take(n: int) -> np.ndarray:
            nonlocal host_avail, consumed
            parts: List[np.ndarray] = []
            need = n
            while need:
                head = host_parts[0]
                if head.shape[0] <= need:
                    parts.append(host_parts.pop(0))
                    need -= parts[-1].shape[0]
                else:
                    parts.append(head[:need])
                    host_parts[0] = head[need:]
                    need = 0
            host_avail -= n
            consumed += n
            if not parts:
                return np.zeros((0, n_feat), np.float32)
            return parts[0] if len(parts) == 1 else np.concatenate(parts)

        def ready():
            while finished and finished[0][1] <= dispatched:
                path, end = finished.popleft()
                while host_avail < end - consumed:
                    flush_oldest()
                yield path, take(end - consumed)

        offset = 0
        for path in trajectory_paths:
            t0 = time.time()
            for block in iter_frame_chunks(
                path, chunk, self.topology.source_path, stride=traj_stride
            ):
                if timeout is not None and time.time() - t0 > timeout:
                    raise TimeoutError(
                        f"Featurization of {path} exceeded the configured "
                        f"timeout of {timeout} s."
                    )
                offset += block.shape[0]
                pos = 0
                while pos < block.shape[0]:
                    n = min(chunk - fill, block.shape[0] - pos)
                    buf[fill : fill + n] = block[pos : pos + n]
                    fill += n
                    pos += n
                    if fill == chunk:
                        dispatch()
            finished.append((path, offset))
            yield from ready()
        if fill:
            buf[fill:] = buf[fill - 1 : fill]
            dispatch()
        yield from ready()
        assert not finished, "trajectory frames unaccounted for"
        dt = time.time() - t_start
        logger.info(
            "Featurized %d trajectories (%d frames x %d features) in %.2fs "
            "through shared chunks (%.0f frames/s)",
            len(trajectory_paths),
            offset,
            n_feat,
            dt,
            offset / max(dt, 1e-9),
        )

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
        # The shared args-form plan program partitions along the frame axis
        # from the input sharding; no constants-baking outer jit.
        ev = self.evaluator
        inner = ev.inner if isinstance(ev, ShardedChunkEvaluator) else ev
        out = inner.eval_raw(frames_d)
        return out, n


def _eval_quantized(evaluator, block: np.ndarray):
    """Featurize a chunk via int16 fixed-point upload (io/upload.py):
    quantize on host, send 2 bytes/coordinate, dequantize on device, then
    run the plan program on the device-resident float32 coords. Halves
    the host->device bytes of the streaming loop — the wall-clock
    bottleneck on bandwidth-starved links."""
    import jax
    import jax.numpy as jnp

    from deep_cartograph_tpu.io.upload import dequant_fn, quantize_coords

    q, scale, offset = quantize_coords(block)
    dq = dequant_fn()
    if isinstance(evaluator, ShardedChunkEvaluator):
        from deep_cartograph_tpu.parallel.mesh import pad_to_multiple

        padded, n = pad_to_multiple(q, evaluator.n_devices)
        qd = jax.device_put(padded, evaluator._sharding)
        coords = dq(qd, jnp.asarray(scale), jnp.asarray(offset))
        out = evaluator.inner.eval_raw(coords)
        return out if out.shape[0] == n else out[:n]
    coords = dq(jnp.asarray(q), jnp.asarray(scale), jnp.asarray(offset))
    return evaluator.eval_raw(coords)


class ShardedChunkEvaluator:
    """Frame-axis-sharded adapter over PlanEvaluator for multi-device
    backends: every fixed-shape chunk splits across all devices of a 1-D
    mesh, so the tools use each chip of a pod slice automatically (the
    reference has no multi-device execution at all; SURVEY §2.5). Exposes
    the PlanEvaluator call surface (__call__/eval_raw/device_fn)."""

    def __init__(self, evaluator: PlanEvaluator):
        import jax

        from deep_cartograph_tpu.parallel.mesh import frame_sharding, get_mesh

        self.inner = evaluator
        self.mesh = get_mesh()
        self.n_devices = int(self.mesh.devices.size)
        self._sharding = frame_sharding(self.mesh)

    def device_fn(self):
        return self.inner.device_fn()

    def eval_raw(self, coords_chunk):
        import jax

        from deep_cartograph_tpu.parallel.mesh import pad_to_multiple

        padded, n = pad_to_multiple(
            np.asarray(coords_chunk, np.float32), self.n_devices
        )
        # device_put straight into the frame sharding; the shared
        # args-form plan program partitions along the frame axis from the
        # input sharding alone (every op is frame-parallel), so no
        # constants-baking outer jit is needed.
        out = self.inner.eval_raw(jax.device_put(padded, self._sharding))
        return out if out.shape[0] == n else out[:n]

    def __call__(self, coords_chunk: np.ndarray) -> np.ndarray:
        return np.asarray(self.eval_raw(coords_chunk))


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
