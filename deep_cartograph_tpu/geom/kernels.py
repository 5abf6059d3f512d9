"""Device geometry kernels (JAX/XLA): the TPU-native featurization engine.

Replaces the per-frame serial C++ loop of the PLUMED driver
(cf. reference modules/plumed/cli.py:85-163 and SURVEY §2.4) with batched
on-device compute: a chunk of frames (C, A, 3) in Angstroms enters HBM once
and every feature of every frame is evaluated in one jitted call.

Unit conventions match PLUMED colvars output: distances and coordinates in
nm, dihedral angles in radians (IUPAC sign).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

ANGSTROM_TO_NM = 0.1


# ---------------------------------------------------------------------------
# Elementary geometry (all vectorized over leading frame axes)
# ---------------------------------------------------------------------------

def pair_distances(coords: jnp.ndarray, pairs: jnp.ndarray) -> jnp.ndarray:
    """Distances between atom pairs. coords (..., A, 3) Angstrom -> (..., P) nm."""
    pa = jnp.take(coords, pairs[:, 0], axis=-2)
    pb = jnp.take(coords, pairs[:, 1], axis=-2)
    diff = pa - pb
    return jnp.sqrt(jnp.sum(diff * diff, axis=-1)) * ANGSTROM_TO_NM


def dihedral_angles(coords: jnp.ndarray, quads: jnp.ndarray) -> jnp.ndarray:
    """Dihedral angles over atom quadruplets (praxeolitic formula, IUPAC sign).

    coords (..., A, 3); quads (Q, 4) -> (..., Q) radians in (-pi, pi].
    """
    p0 = jnp.take(coords, quads[:, 0], axis=-2)
    p1 = jnp.take(coords, quads[:, 1], axis=-2)
    p2 = jnp.take(coords, quads[:, 2], axis=-2)
    p3 = jnp.take(coords, quads[:, 3], axis=-2)

    b0 = p0 - p1
    b1 = p2 - p1
    b2 = p3 - p2

    b1n = b1 / jnp.linalg.norm(b1, axis=-1, keepdims=True)
    # Components perpendicular to b1
    v = b0 - jnp.sum(b0 * b1n, axis=-1, keepdims=True) * b1n
    w = b2 - jnp.sum(b2 * b1n, axis=-1, keepdims=True) * b1n
    x = jnp.sum(v * w, axis=-1)
    y = jnp.sum(jnp.cross(b1n, v) * w, axis=-1)
    return jnp.arctan2(y, x)


def group_centers(
    coords: jnp.ndarray, center_atoms: jnp.ndarray, center_mask: jnp.ndarray
) -> jnp.ndarray:
    """Geometric centers of padded atom groups.

    coords (..., A, 3), center_atoms (G, K), center_mask (G, K)
    -> (..., G, 3) Angstrom.
    """
    gathered = jnp.take(coords, center_atoms.reshape(-1), axis=-2)
    gathered = gathered.reshape(coords.shape[:-2] + center_atoms.shape + (3,))
    w = center_mask[..., None]
    return jnp.sum(gathered * w, axis=-2) / jnp.maximum(
        jnp.sum(w, axis=-2), 1e-12
    )


# ---------------------------------------------------------------------------
# Optimal rotation (Kabsch) — replaces PLUMED FIT_TO_TEMPLATE / MDAnalysis align
# ---------------------------------------------------------------------------

def kabsch_rotation(
    mobile: jnp.ndarray, reference: jnp.ndarray, weights: Optional[jnp.ndarray] = None
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Optimal rotation matrix (proper, det=+1) aligning mobile onto reference.

    mobile/reference: (..., N, 3) already in the same unit.
    Returns (R, mobile_centroid, reference_centroid) where aligned =
    (mobile - mc) @ R^T + rc. Weighted Kabsch via SVD.
    """
    if weights is None:
        w = jnp.ones(mobile.shape[-2], mobile.dtype)
    else:
        w = weights
    w = w / jnp.sum(w)
    wcol = w[..., :, None]
    mc = jnp.sum(mobile * wcol, axis=-2, keepdims=True)
    rc = jnp.sum(reference * wcol, axis=-2, keepdims=True)
    X = (mobile - mc) * wcol
    Y = reference - rc
    # Covariance (3x3): H = X^T Y
    H = jnp.swapaxes(X, -1, -2) @ Y
    U, _, Vt = jnp.linalg.svd(H, full_matrices=False)
    det = jnp.linalg.det(jnp.swapaxes(Vt, -1, -2) @ jnp.swapaxes(U, -1, -2))
    D = jnp.stack(
        [jnp.ones_like(det), jnp.ones_like(det), det], axis=-1
    )
    R = jnp.swapaxes(Vt, -1, -2) * D[..., None, :] @ jnp.swapaxes(U, -1, -2)
    return R, mc, rc


def kabsch_align(
    mobile: jnp.ndarray,
    reference: jnp.ndarray,
    align_weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Rigid-align each frame of `mobile` onto `reference` (both Angstroms).

    mobile (..., N, 3), reference (N, 3). Rotation/translation is fit on
    `align_weights`-weighted atoms and applied to all atoms.
    """
    R, mc, rc = kabsch_rotation(mobile, reference, align_weights)
    return (mobile - mc) @ jnp.swapaxes(R, -1, -2) + rc


def rmsd_per_frame(
    mobile: jnp.ndarray,
    reference: jnp.ndarray,
    fit_weights: Optional[jnp.ndarray] = None,
    rmsd_indices: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Optimal-fit RMSD of each frame vs a reference structure (Angstroms).

    Fitting uses fit_weights; the RMSD is then measured over rmsd_indices
    (defaults to all atoms) — mirroring the reference's fit/group split
    (md.py:1397-1454).
    """
    aligned = kabsch_align(mobile, reference, fit_weights)
    if rmsd_indices is not None:
        aligned = jnp.take(aligned, rmsd_indices, axis=-2)
        reference = jnp.take(reference, rmsd_indices, axis=-2)
    diff = aligned - reference
    return jnp.sqrt(jnp.mean(jnp.sum(diff * diff, axis=-1), axis=-1))


# ---------------------------------------------------------------------------
# Feature-plan evaluation
# ---------------------------------------------------------------------------

@partial(
    jax.jit,
    static_argnames=("n_features", "has_centers", "identity_layout"),
)
def _evaluate_plan_chunk(
    coords: jnp.ndarray,
    dist_selector,
    dist_pairs: jnp.ndarray,
    dist_center_a: jnp.ndarray,
    dist_center_b: jnp.ndarray,
    dihedral_quads: jnp.ndarray,
    dihedral_mode: jnp.ndarray,
    coord_atoms: jnp.ndarray,
    coord_axes: jnp.ndarray,
    center_atoms: jnp.ndarray,
    center_mask: jnp.ndarray,
    out_perm: jnp.ndarray,
    fit_reference: Optional[jnp.ndarray],
    fit_weights: Optional[jnp.ndarray],
    *,
    n_features: int,
    has_centers: bool,
    identity_layout: bool,
) -> jnp.ndarray:
    """Evaluate every feature for a chunk of frames. coords: (C, A, 3) Angstrom.

    Plan arrays are TRACED ARGUMENTS, not closure constants: embedding them
    as XLA constants both slows compilation and keys every (feature list,
    topology) pair to its own executable. As arguments, the jit (and the
    persistent compilation cache) key on SHAPES only — every same-shape
    plan segment reuses one compiled program.

    The output is assembled by CONCATENATING the segment results in plan
    order (distances, dihedrals, coordinates) — when the feature list is
    already grouped that way (`identity_layout`, host-checked at build
    time) no reordering op exists in the program at all; otherwise one
    gather with the traced `out_perm` permutation restores the caller's
    column order. Measured on v5e at bench shapes this is ~35% faster than
    the previous 3x dynamic-scatter assembly (`out.at[:, idx].set`), which
    XLA could not fuse with the producing matmuls.
    """
    C = coords.shape[0]
    segments = []

    if fit_reference is not None:
        coords = kabsch_align(coords, fit_reference, fit_weights)

    n_dist = dist_pairs.shape[0]
    if n_dist and dist_selector is not None:
        # Matmul strategy: the pair difference is an MXU contraction with a
        # (P, A) +1/-1 selector — no dynamic gather in the program. One
        # matmul per axis with a fused square-accumulate epilogue: no
        # (frames, pairs, 3) intermediate, ~8% faster than the einsum form
        # (measured; both are MXU-bound at HIGHEST). Absolute coordinates
        # cancel in this contraction; bf16 MXU passes would lose
        # ~0.05 Angstrom, so force full f32 accuracy.
        sel_t = dist_selector.T  # (A, P)
        sub = coords[..., : sel_t.shape[0], :]
        d2 = None
        for axis in range(3):
            t = jnp.matmul(
                sub[..., axis], sel_t,
                preferred_element_type=coords.dtype,
                precision=jax.lax.Precision.HIGHEST,
            )
            d2 = t * t if d2 is None else d2 + t * t
        segments.append(jnp.sqrt(d2) * ANGSTROM_TO_NM)
    elif n_dist:
        pa = jnp.take(coords, dist_pairs[:, 0], axis=-2)
        pb = jnp.take(coords, dist_pairs[:, 1], axis=-2)
        if center_atoms.shape[0] and has_centers:
            centers = group_centers(coords, center_atoms, center_mask)  # (C, G, 3)
            ca = jnp.asarray(dist_center_a)
            cb = jnp.asarray(dist_center_b)
            pa = jnp.where(
                (ca >= 0)[None, :, None],
                jnp.take(centers, jnp.maximum(ca, 0), axis=-2),
                pa,
            )
            pb = jnp.where(
                (cb >= 0)[None, :, None],
                jnp.take(centers, jnp.maximum(cb, 0), axis=-2),
                pb,
            )
        diff = pa - pb
        d = jnp.sqrt(jnp.sum(diff * diff, axis=-1)) * ANGSTROM_TO_NM
        segments.append(d)

    if dihedral_quads.shape[0]:
        angles = dihedral_angles(coords, dihedral_quads)
        mode = jnp.asarray(dihedral_mode)
        values = jnp.where(
            mode == 0,
            angles,
            jnp.where(mode == 1, jnp.sin(angles), jnp.cos(angles)),
        )
        segments.append(values)

    if coord_atoms.shape[0]:
        pos = jnp.take(coords, coord_atoms, axis=-2)  # (C, K, 3)
        vals = jnp.take_along_axis(
            pos, jnp.asarray(coord_axes)[None, :, None], axis=-1
        )[..., 0]
        segments.append(vals * ANGSTROM_TO_NM)

    if not segments:
        return jnp.zeros((C, n_features), dtype=coords.dtype)
    cat = segments[0] if len(segments) == 1 else jnp.concatenate(segments, 1)
    if identity_layout:
        return cat
    return jnp.take(cat, out_perm, axis=1)


@partial(
    jax.jit,
    static_argnames=("cap", "n_features", "has_centers", "identity_layout"),
)
def _evaluate_plan_chunked(
    coords: jnp.ndarray,
    *plan_args,
    cap: int,
    n_features: int,
    has_centers: bool,
    identity_layout: bool,
) -> jnp.ndarray:
    """One-dispatch evaluation of an arbitrarily long chunk in cap-sized
    windows: a fori_loop slides the compile-cap window over the frame axis
    (the compiled body stays cap-shaped, so compile time is bounded by the
    cap regardless of the caller's chunk size), and a ragged tail is
    covered by an overlapping window whose rows simply overwrite already-
    identical values. Replaces the previous eager Python subchunk loop,
    whose per-subchunk op issue (slice/pad/trim/concat as separate jnp
    calls) cost ~3 ms each on a 1-core host — 6x the program itself.
    """
    C = coords.shape[0]

    def run(blk):
        return _evaluate_plan_chunk(
            blk,
            *plan_args,
            n_features=n_features,
            has_centers=has_centers,
            identity_layout=identity_layout,
        )

    out = jnp.zeros((C, n_features), dtype=coords.dtype)

    def body(i, acc):
        blk = jax.lax.dynamic_slice_in_dim(coords, i * cap, cap, axis=0)
        return jax.lax.dynamic_update_slice_in_dim(
            acc, run(blk), i * cap, axis=0
        )

    out = jax.lax.fori_loop(0, C // cap, body, out)
    if C % cap:
        tail = run(jax.lax.dynamic_slice_in_dim(coords, C - cap, cap, axis=0))
        out = jax.lax.dynamic_update_slice_in_dim(out, tail, C - cap, axis=0)
    return out


class PlanEvaluator:
    """Jit-compiled evaluator for a FeaturePlan on one topology.

    Build once per (feature list, topology); call on frame chunks. The jitted
    function is cached across chunks (static shapes -> single XLA program).
    """

    def __init__(
        self,
        plan,
        fit_reference: Optional[np.ndarray] = None,
        fit_weights: Optional[np.ndarray] = None,
        dtype=jnp.float32,
        gather_strategy: str = "auto",
        device=None,
    ):
        """`device`: optional jax.Device to pin plan arrays and compilation to
        (e.g. the host CPU for tiny workloads where a remote accelerator's
        compile latency dominates). None uses the default backend."""
        self.plan = plan
        self.dtype = dtype
        self._device = device
        with self._device_ctx():
            self._build(plan, fit_reference, fit_weights, gather_strategy)

    def _device_ctx(self):
        import contextlib

        if self._device is None:
            return contextlib.nullcontext()
        return jax.default_device(self._device)

    def _build(self, plan, fit_reference, fit_weights, gather_strategy):
        self._fit_reference = (
            jnp.asarray(fit_reference, self.dtype) if fit_reference is not None else None
        )
        self._fit_weights = (
            jnp.asarray(fit_weights, self.dtype) if fit_weights is not None else None
        )
        self._dist_pairs = jnp.asarray(plan.dist_pairs.reshape(-1, 2))
        # Gather strategy: one-hot +1/-1 selector matmul when small enough
        # and no center entities are involved (auto), else dynamic gather.
        n_dist = plan.dist_pairs.reshape(-1, 2).shape[0]
        n_atoms_total = int(plan.dist_pairs.max() + 1) if n_dist else 0
        has_centers = bool(
            np.any(plan.dist_center_a >= 0) or np.any(plan.dist_center_b >= 0)
        )
        # Measured on TPU v5e: the selector contraction wins when the pair
        # set is DENSE relative to the atom count (it pays 2*A FLOPs per
        # pair but rides the MXU: 1.4-1.8x faster at 48-320 atoms with
        # all-pairs features), while sparse pair sets over big topologies
        # make the gather path 3.7x faster AND two orders of magnitude
        # cheaper to compile (5000 atoms, 10k pairs: 141k vs 38k frames/s,
        # 2.3 s vs 322 s first call — BENCH_protein.json).
        dense_pairs = (
            n_atoms_total <= 512
            or n_dist >= (n_atoms_total * n_atoms_total) // 8
        )
        use_matmul = (
            gather_strategy == "matmul"
            or (
                gather_strategy == "auto"
                and n_dist > 0
                and not has_centers
                and dense_pairs
                and n_dist * max(n_atoms_total, 1) <= 50_000_000
            )
        )
        if use_matmul and n_dist and not has_centers:
            sel = np.zeros((n_dist, n_atoms_total), np.float32)
            rows = np.arange(n_dist)
            sel[rows, plan.dist_pairs[:, 0]] += 1.0
            sel[rows, plan.dist_pairs[:, 1]] -= 1.0
            self._dist_selector = jnp.asarray(sel, self.dtype)
        else:
            self._dist_selector = None
        self._dihedral_quads = jnp.asarray(plan.dihedral_quads.reshape(-1, 4))
        self._dihedral_mode = jnp.asarray(plan.dihedral_mode)
        self._coord_atoms = jnp.asarray(plan.coord_atoms)
        self._coord_axes = jnp.asarray(plan.coord_axes)
        self._center_atoms = jnp.asarray(plan.center_atoms)
        self._center_mask = jnp.asarray(plan.center_mask, self.dtype)
        self._dist_center_a = jnp.asarray(plan.dist_center_a)
        self._dist_center_b = jnp.asarray(plan.dist_center_b)
        # Output layout: segment results are concatenated in plan order
        # (dist, dihedral, coord); `order` maps concat position -> output
        # column. Grouped feature lists (the common case) need no
        # reordering op in the program at all.
        order = np.concatenate(
            [plan.dist_out, plan.dihedral_out, plan.coord_out]
        ).astype(np.int64)
        self._identity_layout = bool(
            order.shape[0] == plan.n_features
            and np.array_equal(order, np.arange(plan.n_features))
        )
        self._out_perm = jnp.asarray(
            np.argsort(order) if order.shape[0] else np.zeros(0, np.int32),
            jnp.int32,
        )
        self._has_centers = has_centers
        self._n_features = int(plan.n_features)
        # Compiled-shape cap: XLA compile time on this backend grows
        # superlinearly with the frame-chunk dimension (measured: ~7 s at
        # 2.5k frames vs ~270 s at 20k for the bench plan), while device
        # execution is thousands of frames per millisecond. Evaluating big
        # caller chunks in fixed-shape subchunks keeps ONE small fast
        # program per plan shape regardless of caller chunking.
        cap = int(
            __import__("os").environ.get("DEEP_CARTO_COMPILE_CHUNK", 4096)
        )
        # <=0 disables the cap (the 0-disables convention of the sibling
        # DEEP_CARTO_* knobs): whole caller chunks compile as one program.
        self._compile_cap = cap if cap > 0 else (1 << 62)

    def _plan_args(self):
        """Plan arrays in _evaluate_plan_chunk argument order (traced args,
        NOT closure constants — see that function's docstring)."""
        return (
            self._dist_selector,
            self._dist_pairs,
            self._dist_center_a,
            self._dist_center_b,
            self._dihedral_quads,
            self._dihedral_mode,
            self._coord_atoms,
            self._coord_axes,
            self._center_atoms,
            self._center_mask,
            self._out_perm,
            self._fit_reference,
            self._fit_weights,
        )

    def _run(self, coords):
        return _evaluate_plan_chunk(
            coords,
            *self._plan_args(),
            n_features=self._n_features,
            has_centers=self._has_centers,
            identity_layout=self._identity_layout,
        )

    def __call__(self, coords_chunk: np.ndarray) -> np.ndarray:
        """(C, A, 3) Angstrom float -> (C, F) feature matrix (nm / radians)."""
        return np.asarray(self.eval_raw(coords_chunk))

    def eval_raw(self, coords_chunk):
        """Evaluate and return the device array (no host download).

        Chunks larger than the compile cap are evaluated by ONE dispatch of
        the fori_loop-windowed program (`_evaluate_plan_chunked`): compile
        time stays bounded by the cap-shaped body, results are exactly the
        unchunked values (the ragged tail is an overlapping window), and
        the per-subchunk Python op-issue of the previous eager loop — the
        bulk of a measured 6.4x slowdown on a 1-core host — is gone.
        """
        with self._device_ctx():
            coords = jnp.asarray(coords_chunk, self.dtype)
            C = coords.shape[0]
            cap = self._compile_cap
            if C <= cap:
                return self._run(coords)
            return _evaluate_plan_chunked(
                coords,
                *self._plan_args(),
                cap=cap,
                n_features=self._n_features,
                has_centers=self._has_centers,
                identity_layout=self._identity_layout,
            )

    def device_fn(self):
        """A coords-only callable of the plan program (for callers that
        re-jit with shardings or compose it into larger programs).

        WARNING: tracing this inside an OUTER jit captures every plan
        array by closure, baking them into the lowered module as dense
        XLA constants. For composition into larger jitted programs use
        device_fn_args() instead."""
        return self._run

    def device_fn_args(self):
        """(fn, plan_args): the closure-free plan program for composing
        into OUTER jitted programs — ``fn(coords, *plan_args)`` evaluates
        the plan with every plan array a traced ARGUMENT, so an enclosing
        jit receives them as parameters instead of embedding them as XLA
        constants (the rule _evaluate_plan_chunk's docstring mandates;
        constants inflate the lowered module by the arrays' full bytes,
        catastrophic through a remote-compile service)."""
        plan_args = self._plan_args()
        n_features = self._n_features
        has_centers = self._has_centers
        identity_layout = self._identity_layout

        def fn(coords, *plan):
            return _evaluate_plan_chunk(
                coords,
                *plan,
                n_features=n_features,
                has_centers=has_centers,
                identity_layout=identity_layout,
            )

        return fn, plan_args
