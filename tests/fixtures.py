"""Programmatic test fixtures: synthetic molecular systems and trajectories."""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

AA_CYCLE = ["ALA", "GLY", "SER", "VAL", "LEU", "THR", "PRO", "PHE"]


@dataclass
class CASystem:
    pdb_path: str
    dcd_path: str
    coords: np.ndarray  # (n_frames, n_atoms, 3) Angstrom
    n_residues: int


def make_ca_coords(n_residues: int, n_frames: int, seed: int = 7) -> np.ndarray:
    """A wobbling helix-ish CA chain: smooth frame-to-frame motion with two
    metastable-looking basins so filters/CVs have signal to find."""
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 4 * np.pi, n_residues)
    base = np.stack([2.3 * np.cos(t), 2.3 * np.sin(t), 1.5 * t], axis=1)

    phases = np.linspace(0, 2 * np.pi, n_frames, endpoint=False)
    # Two-state switching along the trajectory (first half / second half)
    state = (np.arange(n_frames) >= n_frames // 2).astype(float)
    frames = []
    for f in range(n_frames):
        bend = 0.8 * state[f] * np.sin(t)[:, None] * np.array([1.0, 0.0, 0.3])
        breathe = 0.35 * np.sin(phases[f] + t)[:, None] * np.array([0.5, 1.0, 0.0])
        noise = 0.05 * rng.standard_normal((n_residues, 3))
        frames.append(base + bend + breathe + noise)
    return np.asarray(frames, dtype=np.float32)


def write_ca_pdb(path: str, coords_frame: np.ndarray) -> None:
    n = coords_frame.shape[0]
    with open(path, "w") as fh:
        for i in range(n):
            resname = AA_CYCLE[i % len(AA_CYCLE)]
            x, y, z = coords_frame[i]
            fh.write(
                f"ATOM  {i + 1:>5}  CA  {resname:<4}A{i + 1:>4}    "
                f"{x:8.3f}{y:8.3f}{z:8.3f}{1.0:6.2f}{0.0:6.2f}           C\n"
            )
        fh.write("END\n")


def make_ca_system(
    out_dir: str, n_residues: int = 12, n_frames: int = 60, seed: int = 7
) -> CASystem:
    from deep_cartograph_tpu.io.dcd import write_dcd

    os.makedirs(out_dir, exist_ok=True)
    coords = make_ca_coords(n_residues, n_frames, seed)
    pdb_path = os.path.join(out_dir, "ca_example.pdb")
    dcd_path = os.path.join(out_dir, "ca_example.dcd")
    write_ca_pdb(pdb_path, coords[0])
    write_dcd(dcd_path, coords)
    return CASystem(pdb_path, dcd_path, coords, n_residues)


def _rodrigues(axis: np.ndarray, theta: float) -> np.ndarray:
    axis = axis / np.linalg.norm(axis)
    kx, ky, kz = axis
    K = np.array([[0, -kz, ky], [kz, 0, -kx], [-ky, kx, 0]])
    return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * (K @ K)


def make_backbone_system(
    out_dir: str,
    n_residues: int = 6,
    n_frames: int = 120,
    seed: int = 13,
    with_polar_atoms: bool = True,
    prefix: str = "peptide",
) -> CASystem:
    """An all-atom-ish peptide backbone (N[,H], CA, C[,O] per residue) whose
    second chain half rotates about a mid-chain CA-C bond between two
    metastable torsion states — so dihedral features are genuinely bimodal
    and H-bond donors/acceptors (N-H, C=O) exist. Stand-in for the
    reference's bundled peptide/aladip binary data
    (/root/reference/examples/notebooks/{0.introduction,2.peptide_ensemble})."""
    from deep_cartograph_tpu.io.dcd import write_dcd

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)

    names, resnames, resids, base = [], [], [], []
    x = 0.0
    for r in range(1, n_residues + 1):
        zig = 0.55 * ((r % 2) * 2 - 1)
        x += 1.33
        n_pos = np.array([x, zig, 0.08 * r])
        entries = [("N", n_pos)]
        if with_polar_atoms:
            entries.append(("H", n_pos + np.array([-0.35, -0.93, 0.0])))
        x += 1.46
        ca_pos = np.array([x, -zig, 0.12 * r])
        entries.append(("CA", ca_pos))
        x += 1.52
        c_pos = np.array([x, zig * 0.4, 0.05 * r])
        entries.append(("C", c_pos))
        if with_polar_atoms:
            entries.append(("O", c_pos + np.array([0.15, 1.22, 0.0])))
        for name, pos in entries:
            names.append(name)
            resnames.append(AA_CYCLE[(r - 1) % len(AA_CYCLE)])
            resids.append(r)
            base.append(pos)
    base = np.asarray(base, np.float64)
    resids = np.asarray(resids)

    # Pivot bond: CA-C of the middle residue; everything downstream rotates.
    mid = n_residues // 2
    ca_idx = next(
        i for i in range(len(names)) if resids[i] == mid and names[i] == "CA"
    )
    c_idx = next(
        i for i in range(len(names)) if resids[i] == mid and names[i] == "C"
    )
    axis = base[c_idx] - base[ca_idx]
    downstream = np.array(
        [i for i in range(len(names)) if resids[i] > mid], dtype=int
    )

    state = (np.arange(n_frames) >= n_frames // 2).astype(float)
    frames = []
    for f in range(n_frames):
        theta = np.deg2rad(-55.0 + 110.0 * state[f]) + 0.15 * np.sin(
            2 * np.pi * f / 23.0
        )
        R = _rodrigues(axis, theta)
        crd = base.copy()
        crd[downstream] = (crd[downstream] - base[ca_idx]) @ R.T + base[ca_idx]
        crd += 0.04 * rng.standard_normal(crd.shape)
        frames.append(crd)
    coords = np.asarray(frames, dtype=np.float32)

    pdb_path = os.path.join(out_dir, f"{prefix}.pdb")
    with open(pdb_path, "w") as fh:
        for i in range(len(names)):
            nm = names[i]
            fh.write(
                f"ATOM  {i + 1:>5}  {nm:<3} {resnames[i]:<4}A{resids[i]:>4}    "
                f"{coords[0, i, 0]:8.3f}{coords[0, i, 1]:8.3f}"
                f"{coords[0, i, 2]:8.3f}{1.0:6.2f}{0.0:6.2f}           {nm[0]}\n"
            )
        fh.write("END\n")
    dcd_path = os.path.join(out_dir, f"{prefix}.dcd")
    write_dcd(dcd_path, coords)
    return CASystem(pdb_path, dcd_path, coords, n_residues)


def make_shifted_ca_pdb(
    out_dir: str, source: CASystem, resid_offset: int = 100
) -> str:
    """Same structure, shifted residue numbering — exercises topology mapping."""
    n = source.coords.shape[1]
    path = os.path.join(out_dir, "ca_shifted.pdb")
    with open(path, "w") as fh:
        for i in range(n):
            resname = AA_CYCLE[i % len(AA_CYCLE)]
            x, y, z = source.coords[0, i]
            fh.write(
                f"ATOM  {i + 1:>5}  CA  {resname:<4}A{i + 1 + resid_offset:>4}    "
                f"{x:8.3f}{y:8.3f}{z:8.3f}{1.0:6.2f}{0.0:6.2f}           C\n"
            )
        fh.write("END\n")
    return path
