"""Amber mdcrd (.crd) trajectory reading/writing (fixed-format text, 10F8.3).

Completes the reference's supported-format list (SURVEY §2.4 traj-format
flags: dcd/xtc/trr/pdb/gro/xyz/crd).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def read_crd(path: str, n_atoms: int, has_box: bool = False) -> np.ndarray:
    """Read an Amber mdcrd file as (n_frames, n_atoms, 3) Angstroms.

    mdcrd needs the atom count from the topology (the file carries none).
    """
    with open(path) as fh:
        lines = fh.readlines()
    values: list = []
    for line in lines[1:]:  # first line is the title
        for i in range(0, len(line.rstrip("\n")), 8):
            chunk = line[i : i + 8].strip()
            if chunk:
                values.append(float(chunk))
    per_frame = n_atoms * 3 + (3 if has_box else 0)
    n_frames = len(values) // per_frame
    if n_frames == 0:
        raise ValueError(f"No complete frames parsed from {path}")
    arr = np.asarray(values[: n_frames * per_frame], np.float32).reshape(
        n_frames, per_frame
    )
    return arr[:, : n_atoms * 3].reshape(n_frames, n_atoms, 3)


def write_crd(path: str, coords: np.ndarray, title: str = "mdcrd") -> None:
    coords = np.asarray(coords, np.float32)
    n_frames = coords.shape[0]
    with open(path, "w") as fh:
        fh.write(title + "\n")
        for f in range(n_frames):
            flat = coords[f].reshape(-1)
            for i in range(0, len(flat), 10):
                row = flat[i : i + 10]
                fh.write("".join(f"{v:8.3f}" for v in row) + "\n")
