"""Shared helpers for the notebook-style examples: generated input systems
(this repo replaces the reference's bundled binary data with programmatic
generators, cf. /root/reference/examples/notebooks/*)."""

import os
import sys

_REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
sys.path.insert(0, os.path.abspath(_REPO))


def make_transition_system(folder: str, n_residues: int = 16,
                           n_frames: int = 200, seed: int = 11):
    """A CA chain undergoing a two-state transition — the stand-in for the
    reference's GOdMD calpha_transitions inputs."""
    from tests.fixtures import make_ca_system

    os.makedirs(folder, exist_ok=True)
    return make_ca_system(folder, n_residues=n_residues,
                          n_frames=n_frames, seed=seed)


def make_peptide_system(folder: str, n_residues: int = 6,
                        n_frames: int = 160, seed: int = 13,
                        prefix: str = "peptide"):
    """An all-atom-ish backbone peptide with bimodal torsions — the stand-in
    for the reference's bundled aladip/peptide binary data."""
    from tests.fixtures import make_backbone_system

    os.makedirs(folder, exist_ok=True)
    return make_backbone_system(folder, n_residues=n_residues,
                                n_frames=n_frames, seed=seed, prefix=prefix)


def banner(title: str) -> None:
    print(f"\n{'=' * len(title)}\n{title}\n{'=' * len(title)}")
