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
