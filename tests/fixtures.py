"""Programmatic test fixtures: synthetic molecular systems and trajectories.

The generators live in deep_cartograph_tpu/utils/demo_data.py (they also
back the drop-in `deep_cartograph.data` package); this module wraps them in
test-friendly shapes."""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from deep_cartograph_tpu.utils.demo_data import (
    AA_CYCLE,
    backbone_coords,
    ca_coords as make_ca_coords,
    write_backbone_pdb,
    write_ca_pdb,
)

__all__ = [
    "AA_CYCLE",
    "CASystem",
    "make_ca_coords",
    "make_ca_system",
    "make_backbone_system",
    "make_shifted_ca_pdb",
    "write_ca_pdb",
]


@dataclass
class CASystem:
    pdb_path: str
    dcd_path: str
    coords: np.ndarray  # (n_frames, n_atoms, 3) Angstrom
    n_residues: int


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


def make_backbone_system(
    out_dir: str,
    n_residues: int = 6,
    n_frames: int = 120,
    seed: int = 13,
    with_polar_atoms: bool = True,
    prefix: str = "peptide",
) -> CASystem:
    """An all-atom-ish peptide backbone with bimodal torsions and N-H/C=O
    polar atoms (demo_data.backbone_coords). Stand-in for the reference's
    bundled peptide/aladip binary data."""
    from deep_cartograph_tpu.io.dcd import write_dcd

    os.makedirs(out_dir, exist_ok=True)
    coords, names, resnames, resids = backbone_coords(
        n_residues=n_residues,
        n_frames=n_frames,
        seed=seed,
        with_polar_atoms=with_polar_atoms,
    )
    pdb_path = os.path.join(out_dir, f"{prefix}.pdb")
    write_backbone_pdb(pdb_path, coords[0], names, resnames, resids)
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
