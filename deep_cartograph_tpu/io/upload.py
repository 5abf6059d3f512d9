"""Quantized host->device coordinate upload (int16 fixed point).

Host->device bandwidth, not device compute, is the wall-clock bottleneck
for streamed featurization whenever the link is slow — a remote-attached
chip tunnel measures ~20-35 MB/s here, so a 368 MB float32 coordinate
stream costs 10-17 s while the featurize+moments compute it feeds costs
~1.6 s (BENCH_config5.json: filter_pass_moments_s vs
moments_pass_device_resident_s).

Coordinates tolerate fixed-point transport. GROMACS' XTC — the de facto
standard compressed trajectory format (reference reads it through
MDAnalysis, /root/reference/deep_cartograph/modules/md/__init__.py) —
stores positions as 1e-3 Angstrom fixed point; int16 per-block
quantization here has max error span/2/32767 (~1.5e-3 A for a 100 A box),
the same precision class the field already accepts for the trajectory
data itself. Upload bytes halve (f32 -> i16).

Split of work:
  * quantize_coords() — host side, numpy: per-axis symmetric scale/offset
    over the block, round to int16. ~5 cheap passes over the block,
    microseconds against a multi-second upload.
  * dequantize_coords() — jittable; scale/offset ride as (3,) ARGUMENTS
    (never closure constants) so callers can compose it into fused
    device programs (dequant + residency update + featurize in one
    dispatch) without baking data into the lowered module.
  * upload_coords() — convenience: quantize, transfer, dequantize on
    device, return a float32 device array. Drop-in for jnp.asarray(block).

`Featurizer.featurize_trajectory(upload="int16")` (geom/engine.py) uses
this for every chunk; the config-5 bench fuses dequantize into its
moments/residency program.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

__all__ = [
    "quantize_coords",
    "dequantize_coords",
    "upload_coords",
    "dequant_fn",
    "quantization_step",
    "resolve_upload_mode",
]

# int16 symmetric range; one code point spare so the grid is symmetric
# around the offset and round() can never overflow the dtype.
_QLEVELS = 32767


def quantize_coords(
    block: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Quantize an (..., 3) float coordinate block to int16 fixed point.

    Returns (q, scale, offset): ``x ~= q * scale + offset`` with per-axis
    (3,) float32 scale/offset. Max abs error is ``scale / 2`` per axis
    (~1.5e-3 A for a 100 A span — the XTC precision class). Degenerate
    axes (zero span) round-trip exactly.
    """
    x = np.asarray(block, np.float32)
    # Staged per-axis min/max: reducing axis 0 repeatedly keeps every pass
    # vectorized over the trailing contiguous dims — 20x faster than one
    # strided reduction over a (N, 3) view (49 ms -> 2.4 ms for an 11 MB
    # chunk on this host; the whole quantize must stay microseconds-class
    # against the multi-second upload it feeds).
    mn, mx = x, x
    while mn.ndim > 1:
        mn, mx = mn.min(0), mx.max(0)
    offset = ((mn + mx) * 0.5).astype(np.float32)
    span = (mx - mn).astype(np.float32)
    # Guard zero-span axes: scale stays finite, q becomes exactly 0.
    scale = np.maximum(span / (2.0 * _QLEVELS), 1e-30).astype(np.float32)
    y = x - offset
    y *= (1.0 / scale).astype(np.float32)
    np.rint(y, out=y)
    q = y.astype(np.int16)
    return q, scale, offset


def dequantize_coords(q, scale, offset):
    """Jittable inverse of quantize_coords: int16 -> float32 coords.

    scale/offset are (3,) traced arguments — compose freely inside outer
    jits (cf. PlanEvaluator.device_fn_args constant-baking rule,
    geom/kernels.py).
    """
    import jax.numpy as jnp

    return q.astype(jnp.float32) * scale + offset


def quantization_step(scale: np.ndarray) -> float:
    """Largest per-coordinate absolute error the scale implies (A)."""
    return float(np.max(np.asarray(scale)) * 0.5)


def upload_coords(block: np.ndarray, mode: str = "int16"):
    """Transfer a coordinate block host->device, returning float32 on device.

    mode="int16" sends 2 bytes/coordinate (fixed point, dequantized on
    device); mode="float32" is a plain transfer. Drop-in replacement for
    ``jnp.asarray(block, float32)``.
    """
    import jax
    import jax.numpy as jnp

    if mode == "float32":
        return jnp.asarray(block, jnp.float32)
    if mode != "int16":
        raise ValueError(f"unknown upload mode {mode!r} (int16|float32)")
    q, scale, offset = quantize_coords(block)
    return dequant_fn()(jnp.asarray(q), jnp.asarray(scale), jnp.asarray(offset))


_DEQUANT = None


def dequant_fn():
    """The cached jitted dequantize program (shared across callers)."""
    global _DEQUANT
    if _DEQUANT is None:
        import jax

        _DEQUANT = jax.jit(dequantize_coords)
    return _DEQUANT


def resolve_upload_mode(mode: str = "auto") -> str:
    """Resolve an upload-mode setting to 'int16' or 'float32'.

    'auto' honors the DC_TPU_UPLOAD environment variable and defaults to
    float32 (exact transport) — int16 is an explicit opt-in for
    bandwidth-starved links.
    """
    import os

    if mode == "auto":
        mode = os.environ.get("DC_TPU_UPLOAD", "float32")
    if mode not in ("int16", "float32"):
        raise ValueError(f"unknown upload mode {mode!r} (auto|int16|float32)")
    return mode
