"""Müller-Brown potential: on-device Langevin sampler for validation data.

The reference ships example datasets including a Müller-Brown system
(deep_cartograph/data/muller_brown). Instead of binary fixtures, this module
generates the data: the classic 2-D potential (Müller & Brown, Theor. Chim.
Acta 1979) sampled with overdamped Langevin dynamics as a single
lax.scan-compiled device program. Used by examples and by physics-grounded
tests (a good CV must separate the metastable basins).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Standard Müller-Brown parameters
_A = jnp.asarray([-200.0, -100.0, -170.0, 15.0])
_a = jnp.asarray([-1.0, -1.0, -6.5, 0.7])
_b = jnp.asarray([0.0, 0.0, 11.0, 0.6])
_c = jnp.asarray([-10.0, -10.0, -6.5, 0.7])
_x0 = jnp.asarray([1.0, 0.0, -0.5, -1.0])
_y0 = jnp.asarray([0.0, 0.5, 1.5, 1.0])

# Approximate basin minima (for tests/labels)
MINIMA = np.asarray(
    [[-0.558, 1.442], [0.623, 0.028], [-0.050, 0.467]], dtype=np.float32
)


def potential(xy: jnp.ndarray) -> jnp.ndarray:
    """V(x, y) for points of shape (..., 2)."""
    x = xy[..., 0:1]
    y = xy[..., 1:2]
    terms = _A * jnp.exp(
        _a * (x - _x0) ** 2 + _b * (x - _x0) * (y - _y0) + _c * (y - _y0) ** 2
    )
    return jnp.sum(terms, axis=-1)


_grad_potential = jax.grad(lambda p: jnp.sum(potential(p)))


@partial(jax.jit, static_argnames=("n_steps", "stride"))
def _sample(key, x0, n_steps: int, stride: int, dt, kt):
    """Overdamped Langevin: x += -grad V dt + sqrt(2 kT dt) xi."""
    noise_scale = jnp.sqrt(2.0 * kt * dt)

    def step(carry, _):
        x, key = carry
        key, sub = jax.random.split(key)
        xi = jax.random.normal(sub, x.shape)
        g = jnp.clip(_grad_potential(x), -1e3, 1e3)
        x = x - g * dt + noise_scale * xi
        return (x, key), x

    (x, key), path = jax.lax.scan(step, (x0, key), None, length=n_steps)
    return path[::stride]


def sample_trajectory(
    n_frames: int = 5000,
    stride: int = 10,
    dt: float = 1e-4,
    kt: float = 15.0,
    seed: int = 0,
    x_init: Tuple[float, float] = (-0.5, 1.4),
) -> np.ndarray:
    """(n_frames, 2) Langevin trajectory on the Müller-Brown surface."""
    from deep_cartograph_tpu.utils.device import maybe_cpu

    key = jax.random.PRNGKey(seed)
    x0 = jnp.asarray(x_init, jnp.float32)
    # The sequential scan is latency-bound, not throughput-bound: small
    # sample counts run on the host CPU (remote compile would dominate).
    with maybe_cpu(float(n_frames) * stride * 100):
        path = _sample(key, x0, n_frames * stride, stride, jnp.float32(dt),
                       jnp.float32(kt))
        return np.asarray(path)


def basin_labels(xy: np.ndarray) -> np.ndarray:
    """Nearest-minimum label per sample (0: upper-left, 1: lower-right,
    2: middle)."""
    d2 = ((xy[:, None, :] - MINIMA[None, :, :]) ** 2).sum(-1)
    return d2.argmin(axis=1)


def as_ca_trajectory(xy: np.ndarray) -> np.ndarray:
    """Embed the 2-D samples as a fake 3-atom 'CA' system so the full
    pipeline (featurization from coordinates) can run on this data:
    atom0 at origin, atom1 encodes x on the x-axis, atom2 encodes y."""
    n = xy.shape[0]
    coords = np.zeros((n, 3, 3), np.float32)
    coords[:, 1, 0] = 10.0 + xy[:, 0]
    coords[:, 2, 1] = 10.0 + xy[:, 1]
    return coords
