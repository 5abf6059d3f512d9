"""Hydrogen-bond barcode analysis along trajectories.

Port of /root/reference/examples/notebooks/extra/h_bond_analysis.ipynb
(H-bonds of p53 between residue pairs via MDAnalysis HydrogenBondAnalysis):
the same per-residue-pair donor/hydrogen/acceptor bookkeeping, but the
geometry for ALL frames and candidate triplets is evaluated in one
vectorized device program (deep_cartograph_tpu.geom.hbonds) instead of a
frame-by-frame Python loop.

The reference reads p53 PDB trajectories from a cluster path; this port
generates a system of donor/acceptor residue pairs that bind and unbind on
different schedules (N-H...O=C at ~2.9 A and ~180 deg when bound), so the
barcode shows bonds forming and breaking like the notebook's
R282-S116 / R282-T125 / T125-G117 analysis.

Run: python extra_h_bond_analysis.py    (writes ./output_hbonds/)
"""

import os

import numpy as np

from _common import banner

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "output_hbonds")
os.makedirs(OUT, exist_ok=True)


def make_hbond_system(folder: str, n_frames: int = 150, seed: int = 0,
                      schedules=((0.0, 40.0), (30.0, 100.0), (80.0, 150.0))):
    """Three donor(N-H)/acceptor(C=O) residue pairs, stacked along x.
    Pair p is BOUND (H...O = 1.9 A, angle 180 deg) inside its frame window
    `schedules[p]` and swings out to 5 A otherwise."""
    import sys
    sys.path.insert(0, os.path.abspath(os.path.join(HERE, "..", "..")))
    from deep_cartograph_tpu.io.dcd import write_dcd

    os.makedirs(folder, exist_ok=True)
    rng = np.random.default_rng(seed)

    names, resnames, resids, chains = [], [], [], []
    n_pairs = len(schedules)
    for p in range(n_pairs):
        for nm, rn in (("N", "ALA"), ("H", "ALA"), ("CA", "ALA")):
            names.append(nm); resnames.append(rn); resids.append(2 * p + 1)
        for nm, rn in (("C", "GLY"), ("O", "GLY"), ("CA", "GLY")):
            names.append(nm); resnames.append(rn); resids.append(2 * p + 2)

    frames = []
    for f in range(n_frames):
        crd = np.zeros((len(names), 3))
        for p, (lo, hi) in enumerate(schedules):
            x0 = 12.0 * p
            bound = lo <= f < hi
            ha = 1.9 if bound else 5.0  # H...O distance
            i = 6 * p
            # donor residue: N, its amide H pointing +y, a CA behind
            crd[i + 0] = (x0, 0.0, 0.0)          # N
            crd[i + 1] = (x0, 1.0, 0.0)          # H (N-H along +y)
            crd[i + 2] = (x0 + 1.5, -0.8, 0.0)   # CA
            # acceptor residue: carbonyl O straight up the N-H axis
            crd[i + 4] = (x0, 1.0 + ha, 0.0)     # O
            crd[i + 3] = (x0, 2.23 + ha, 0.0)    # C (C=O 1.23 A)
            crd[i + 5] = (x0 + 1.5, 3.0 + ha, 0.0)  # CA
        crd += 0.05 * rng.standard_normal(crd.shape)
        frames.append(crd)
    coords = np.asarray(frames, np.float32)

    pdb = os.path.join(folder, "hb_system.pdb")
    with open(pdb, "w") as fh:
        for i in range(len(names)):
            nm = names[i]
            fh.write(
                f"ATOM  {i + 1:>5}  {nm:<3} {resnames[i]:<4}A{resids[i]:>4}    "
                f"{coords[0, i, 0]:8.3f}{coords[0, i, 1]:8.3f}"
                f"{coords[0, i, 2]:8.3f}{1.0:6.2f}{0.0:6.2f}           {nm[0]}\n"
            )
        fh.write("END\n")
    dcd = os.path.join(folder, "hb_system.dcd")
    write_dcd(dcd, coords)
    return pdb, dcd


from deep_cartograph_tpu.geom.hbonds import (  # noqa: E402
    analyze_residue_hbonds,
    hbond_occupancy,
    plot_multibond_barcode,
)

# Two replicas with different binding schedules (the notebook loops over
# several p53 trajectories)
replicas = {
    "traj_1": make_hbond_system(os.path.join(OUT, "input_1"), seed=61,
                                schedules=((0, 40), (30, 100), (80, 150))),
    "traj_2": make_hbond_system(os.path.join(OUT, "input_2"), seed=62,
                                schedules=((0, 150), (50, 60), (0, 0))),
}

PAIRS = [
    ("ALA1(N-H)...GLY2(O)", "resid 1", "resid 2"),
    ("ALA3(N-H)...GLY4(O)", "resid 3", "resid 4"),
    ("ALA5(N-H)...GLY6(O)", "resid 5", "resid 6"),
]

for traj_name, (pdb, dcd) in replicas.items():
    banner(traj_name)
    results = {}
    total_frames = 0
    for label, donor_res, acceptor_res in PAIRS:
        df, total_frames = analyze_residue_hbonds(
            topology_file=pdb,
            trajectory_file=dcd,
            first_selection=donor_res,
            second_selection=acceptor_res,
            d_a_cutoff=3.0,
            d_h_a_angle_cutoff=150.0,
            donors_sel="name N",
            hydrogens_sel="name H",
            acceptors_sel="name O",
        )
        results[label] = df
        occ = hbond_occupancy(df, total_frames)
        print(f"  {label}: {len(df)} events, occupancy {100 * occ:.1f}%")

    png = os.path.join(OUT, f"{traj_name}_barcode.png")
    plot_multibond_barcode(results, total_frames, dt=0.1,
                           title=f"{traj_name} H-bonds", file_path=png)
    print(f"  barcode -> {png}")

banner("Done — artifacts under " + OUT)
