"""On-device serving: frames -> CV values as one fused jitted program.

The reference deploys trained CVs only through PLUMED inside MD engines.
For TPU-side serving (on-the-fly analysis of streaming trajectory frames,
adaptive-sampling loops), this module fuses the featurization plan with the
CV projection into a single compiled device function:

    pipeline = FramesToCV.from_model_zip("model.zip", "topology.pdb")
    cv_values = pipeline(coords_chunk)      # (C, A, 3) -> (C, dim)

Works for every CV family with a deterministic device path (linear CVs and
flax deep CVs); UMAP serves through its transform() (kNN re-embedding).
"""

from __future__ import annotations

import logging
import tempfile
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from deep_cartograph_tpu.cv.base import CVCalculator
from deep_cartograph_tpu.cv.deep import NonLinear
from deep_cartograph_tpu.cv.linear import LinearCalculator
from deep_cartograph_tpu.features.grammar import compile_plan
from deep_cartograph_tpu.geom.kernels import PlanEvaluator
from deep_cartograph_tpu.io.topology import Topology

logger = logging.getLogger(__name__)


class FramesToCV:
    """Fused featurize+project pipeline for a trained CV on one topology."""

    def __init__(
        self,
        calculator: CVCalculator,
        topology: Topology,
        features_list: Optional[List[str]] = None,
    ):
        self.calculator = calculator
        self.topology = topology
        labels = features_list or calculator.features_ref_labels
        self.plan = compile_plan(labels, topology)
        self.evaluator = PlanEvaluator(self.plan)
        feature_fn = self.evaluator.device_fn()

        project = self._device_projection()
        # Deliberately ONE fused program (featurize + projection in a
        # single dispatch — serving latency wins). The outer trace bakes
        # the plan arrays in as constants, trading the shared-executable
        # reuse geom.kernels provides for fusion: a serving process
        # compiles once per deployed model, so the trade is right here.
        self._jitted = jax.jit(lambda coords: project(feature_fn(coords)))

        # Multi-chip serving: frame-shard every batch over the mesh
        # automatically (same policy as geom.engine.ShardedChunkEvaluator).
        self._sharding = None
        try:
            n_dev = len(jax.devices())
        except RuntimeError:
            n_dev = 1
        if n_dev > 1:
            from deep_cartograph_tpu.parallel.mesh import (
                frame_sharding,
                get_mesh,
            )

            mesh = get_mesh()
            self._n_devices = int(mesh.devices.size)
            self._sharding = frame_sharding(mesh)
            self._jitted_sharded = jax.jit(
                lambda coords: project(feature_fn(coords)),
                out_shardings=self._sharding,
            )

    def _device_projection(self) -> Callable:
        calc = self.calculator
        if isinstance(calc, LinearCalculator):
            fmean = jnp.asarray(calc.features_norm_mean, jnp.float32)
            frange = jnp.asarray(calc.features_norm_range, jnp.float32)
            weights = jnp.asarray(calc.cv, jnp.float32)
            cmean = jnp.asarray(calc.cv_norm_mean, jnp.float32)
            crange = jnp.asarray(calc.cv_norm_range, jnp.float32)

            def project(features):
                normalized = (features - fmean) / frange
                return (normalized @ weights - cmean) / crange

            return project
        if isinstance(calc, NonLinear):
            module = calc.module
            params = calc.params
            post_mean = (
                jnp.asarray(calc.post_mean, jnp.float32)
                if calc.post_mean is not None
                else None
            )
            post_range = (
                jnp.asarray(calc.post_range, jnp.float32)
                if calc.post_range is not None
                else None
            )
            tica_evecs = (
                jnp.asarray(calc.tica_evecs, jnp.float32)
                if getattr(calc, "tica_evecs", None) is not None
                else None
            )

            def project(features):
                out = module.apply({"params": params}, features, train=False)
                if tica_evecs is not None:
                    out = out @ tica_evecs
                if post_mean is not None:
                    out = (out - post_mean) / post_range
                return out

            return project
        raise TypeError(
            f"FramesToCV has no fused device path for {type(calc).__name__}; "
            "use calculator.project_data instead."
        )

    def __call__(self, coords: np.ndarray) -> np.ndarray:
        """(C, A, 3) Angstrom frames -> (C, cv_dimension) CV values."""
        if self._sharding is not None:
            from deep_cartograph_tpu.parallel.mesh import pad_to_multiple

            padded, n = pad_to_multiple(
                np.asarray(coords, np.float32), self._n_devices
            )
            out = self._jitted_sharded(
                jax.device_put(padded, self._sharding)
            )
            return np.asarray(out)[:n]
        return np.asarray(self._jitted(jnp.asarray(coords, jnp.float32)))

    def device_fn(self) -> Callable:
        """The raw jitted frames->CV function (for sharded/streaming callers)."""
        return self._jitted

    @classmethod
    def from_model_zip(
        cls, model_path: str, topology_path: str, output_path: Optional[str] = None
    ) -> "FramesToCV":
        out = output_path or tempfile.mkdtemp()
        calculator = CVCalculator.load(model_path, out)
        topology = Topology.from_file(topology_path)
        # Translate model features onto this topology if numbering differs
        from deep_cartograph_tpu.features.translator import Translator

        translated = Translator(
            calculator.ref_topology_path, topology_path,
            calculator.features_ref_labels,
        ).run()
        if None in translated:
            raise ValueError(
                "Some model features cannot be translated to the serving topology."
            )
        return cls(calculator, topology, features_list=translated)
