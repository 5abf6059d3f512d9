"""Pallas TPU kernels for the bandwidth-bound hot ops.

Two ops where hand-tiling beats the XLA default:

1. pairwise_distance_matrix — per-frame all-pairs distances (dRMSD, contact
   analysis, UMAP kNN). Formulated as |a|^2 + |b|^2 - 2 a.b so the cross
   term rides the MXU; tiles are (8, 128)-aligned with coordinates laid out
   (3, A) so atoms occupy the 128-lane axis.

2. kde_logsumexp — KDE free-energy surfaces evaluate sum_j exp(-|g_i - x_j|^2
   / 2h^2) over all samples for every grid point. The kernel streams sample
   blocks through VMEM with a running (max, sum) online-logsumexp
   accumulator, so the (grid, samples) matrix is never materialized in HBM.

All kernels run under interpret mode on CPU (tests) and compile with Mosaic
on TPU. The selector-distance featurization kernel (3) measures AT PARITY
with the XLA per-axis matmul form in geom/kernels.py (~11M frames/s at bench
shapes on v5e) — both are MXU-bound by the K=48 HIGHEST-precision
contraction, so the fused VMEM accumulator buys no additional bandwidth; the
XLA form stays the default and the kernel documents the tiling recipe.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _is_cpu() -> bool:
    return jax.devices()[0].platform == "cpu"


# ---------------------------------------------------------------------------
# 1. All-pairs distance matrix
# ---------------------------------------------------------------------------

def _pairdist_kernel(a_ref, b_ref, out_ref):
    """One (TA, TB) tile of the distance matrix for one frame.

    a_ref: (1, TA, 8) — row-tile coords, channel-padded (canonical M,K)
    b_ref: (1, 8, TB) — column-tile coords, channel-major (canonical K,N)
    out_ref: (1, TA, TB)
    """
    a = a_ref[0]  # (TA, 8)
    b = b_ref[0]  # (8, TB)
    # Channel-wise broadcast accumulation on the VPU: exact f32. (The MXU
    # path routes tiny-K matmuls through bf16 on this backend, costing ~1e-2
    # relative error; with K<=8 the MXU offers no speedup either.)
    d2 = (a[:, 0:1] - b[0:1, :]) ** 2
    for c in range(1, 8):
        d2 = d2 + (a[:, c : c + 1] - b[c : c + 1, :]) ** 2
    out_ref[0] = jnp.sqrt(d2)


@functools.partial(jax.jit, static_argnames=("tile",))
def pairwise_distance_matrix(coords: jnp.ndarray, tile: int = 128) -> jnp.ndarray:
    """All-pairs Euclidean distances per frame via a tiled Pallas kernel.

    coords: (F, A, 3) -> (F, A, A). A is padded to the tile size internally.
    """
    f, a, _ = coords.shape
    a_pad = (a + tile - 1) // tile * tile
    # Two layouts: rows as (F, A_pad, 8) [atoms on sublanes], columns as
    # (F, 8, A_pad) [atoms on lanes] so the cross term is a canonical matmul.
    x_rows = jnp.zeros((f, a_pad, 8), coords.dtype)
    x_rows = x_rows.at[:, :a, :3].set(coords)
    x_cols = jnp.zeros((f, 8, a_pad), coords.dtype)
    x_cols = x_cols.at[:, :3, :a].set(jnp.swapaxes(coords, 1, 2))

    grid = (f, a_pad // tile, a_pad // tile)
    out = pl.pallas_call(
        _pairdist_kernel,
        out_shape=jax.ShapeDtypeStruct((f, a_pad, a_pad), coords.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, tile, 8), lambda fi, i, j: (fi, i, 0),
                memory_space=pl.ANY if _is_cpu() else pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 8, tile), lambda fi, i, j: (fi, 0, j),
                memory_space=pl.ANY if _is_cpu() else pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tile, tile), lambda fi, i, j: (fi, i, j),
            memory_space=pl.ANY if _is_cpu() else pltpu.VMEM,
        ),
        interpret=_is_cpu(),
    )(x_rows, x_cols)
    return out[:, :a, :a]


# ---------------------------------------------------------------------------
# 2. Streaming KDE logsumexp
# ---------------------------------------------------------------------------

def _kde_kernel(grid_ref, samples_ref, out_ref, *, n_sample_blocks, block):
    """Online logsumexp of -|g - x|^2 * inv_bw2 over all sample blocks.

    grid_ref: (TG, 8) — grid points, channel-padded
    samples_ref: (8, NS_pad) — channel-major samples; streamed in lane
                 blocks from VMEM/ANY
    out_ref: (TG, 128) — column 0 holds the result (lane-padded)
    """
    g = grid_ref[...]  # (TG, 8)
    tg = g.shape[0]

    def body(k, carry):
        m, s = carry
        x = samples_ref[:, pl.ds(k * block, block)]  # (8, block)
        # Channel-wise VPU broadcast accumulation (exact f32; see pairdist)
        d2 = (g[:, 0:1] - x[0:1, :]) ** 2
        for c in range(1, 8):
            d2 = d2 + (g[:, c : c + 1] - x[c : c + 1, :]) ** 2
        logk = -d2                                          # scaled outside
        block_max = jnp.max(logk, axis=1, keepdims=True)
        new_m = jnp.maximum(m, block_max)
        s = s * jnp.exp(m - new_m) + jnp.sum(
            jnp.exp(logk - new_m), axis=1, keepdims=True
        )
        return new_m, s

    m0 = jnp.full((tg, 1), -jnp.inf, jnp.float32)
    s0 = jnp.zeros((tg, 1), jnp.float32)
    m, s = jax.lax.fori_loop(0, n_sample_blocks, body, (m0, s0))
    result = m + jnp.log(jnp.maximum(s, 1e-38))             # (TG, 1)
    out_ref[...] = jnp.broadcast_to(result, (tg, 128))


@functools.partial(jax.jit, static_argnames=("tile", "sample_block"))
def kde_logsumexp(
    grid_points: jnp.ndarray,
    samples: jnp.ndarray,
    inv_two_bw2: float,
    tile: int = 256,
    sample_block: int = 2048,
) -> jnp.ndarray:
    """log sum_j exp(-|g_i - x_j|^2 / (2 bw^2)) for all grid points.

    grid_points: (G, D), samples: (N, D) with D <= 8. Returns (G,).
    Distances are pre-scaled by sqrt(inv_two_bw2) so the kernel computes a
    plain squared distance.
    """
    g, d = grid_points.shape
    n = samples.shape[0]
    scale = jnp.sqrt(jnp.asarray(inv_two_bw2, jnp.float32))

    g_pad = (g + tile - 1) // tile * tile
    n_pad = (n + sample_block - 1) // sample_block * sample_block
    gp = jnp.zeros((g_pad, 8), jnp.float32)
    gp = gp.at[:g, :d].set(grid_points.astype(jnp.float32) * scale)
    # Padded channels are zero on both sides (no distance contribution);
    # padded sample ROWS get a sentinel whose squared distance overflows
    # to +inf in f32 for ANY finite grid point, so exp(-d2) is exactly 0.
    # (A finite sentinel like 1e4 would contribute real density to grid
    # points whose scaled coordinate lands near it — absolute-position
    # CVs with small bandwidths reach such values.)
    sp = jnp.zeros((8, n_pad), jnp.float32)
    sp = sp.at[:d, :n].set(samples.astype(jnp.float32).T * scale)
    sp = sp.at[0, n:].set(1e20)

    out = pl.pallas_call(
        functools.partial(
            _kde_kernel,
            n_sample_blocks=n_pad // sample_block,
            block=sample_block,
        ),
        out_shape=jax.ShapeDtypeStruct((g_pad, 128), jnp.float32),
        grid=(g_pad // tile,),
        in_specs=[
            pl.BlockSpec(
                (tile, 8), lambda i: (i, 0),
                memory_space=pl.ANY if _is_cpu() else pltpu.VMEM,
            ),
            pl.BlockSpec(
                (8, n_pad), lambda i: (0, 0),
                memory_space=pl.ANY if _is_cpu() else pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile, 128), lambda i: (i, 0),
            memory_space=pl.ANY if _is_cpu() else pltpu.VMEM,
        ),
        interpret=_is_cpu(),
    )(gp, sp)
    return out[:g, 0]


# ---------------------------------------------------------------------------
# 3. Selector pair distances (the featurization hot kernel)
# ---------------------------------------------------------------------------

def _seldist_kernel(cx_ref, cy_ref, cz_ref, sel_ref, out_ref):
    """One (TF, TP) tile of pair distances from a +/-1 selector.

    cx/cy/cz: (TF, A) per-axis coordinates; sel: (A, TP); out: (TF, TP).
    d^2 accumulates across the three axis matmuls entirely in VMEM — the
    (frames, pairs, 3) difference tensor the XLA formulation materializes in
    HBM never exists. HIGHEST precision keeps the cancellation-prone
    contraction exact in f32.
    """
    sel = sel_ref[...]
    acc = None
    for ref in (cx_ref, cy_ref, cz_ref):
        t = jax.lax.dot(
            ref[...], sel, precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        acc = t * t if acc is None else acc + t * t
    out_ref[...] = jnp.sqrt(acc) * 0.1  # Angstrom -> nm


@functools.partial(jax.jit, static_argnames=("tile_f", "tile_p"))
def selector_pair_distances(
    coords: jnp.ndarray,
    sel_t: jnp.ndarray,
    tile_f: int = 256,
    tile_p: int = 512,
) -> jnp.ndarray:
    """Pair distances (nm) via a fused selector-matmul Pallas kernel.

    coords: (F, A, 3) Angstroms; sel_t: (A, P) columns of +1/-1 per pair.
    Returns (F, P). Callers pad F and P to tile multiples (PlanEvaluator
    does).

    Measured on v5e against the production XLA form in
    geom/kernels._evaluate_plan_chunk (three HIGHEST matmuls + fused
    square-accumulate), 50 iterations per dispatch so kernel time
    dominates: 0.96-1.08x across (4096,48,1128) .. (2048,1024,8192) —
    PARITY, both MXU-bound by the HIGHEST-precision contraction. XLA
    already keeps the d^2 accumulator in registers/VMEM for these shapes,
    so the hand fusion buys nothing; the XLA form stays the production
    default and this kernel stands as the tested tiling recipe (an
    earlier ~3x figure was against the unfused (F,P,3)-materializing
    einsum, which is no longer the comparison that matters).
    """
    f, a, _ = coords.shape
    p = sel_t.shape[1]
    cx, cy, cz = coords[:, :, 0], coords[:, :, 1], coords[:, :, 2]
    grid = (f // tile_f, p // tile_p)
    return pl.pallas_call(
        _seldist_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_f, a), lambda i, j: (i, 0)),
            pl.BlockSpec((tile_f, a), lambda i, j: (i, 0)),
            pl.BlockSpec((tile_f, a), lambda i, j: (i, 0)),
            pl.BlockSpec((a, tile_p), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((tile_f, tile_p), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((f, p), jnp.float32),
        interpret=_is_cpu(),
    )(cx, cy, cz, sel_t)
