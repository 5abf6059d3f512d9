"""GOdMD-to-all-atom CV workflow: chimera building, QC, deep-TICA, projection.

Port of /root/reference/examples/notebooks/7.GOdMD_to_all-atom/{LAT1,PKA_RIalpha}
(1.preparation / 2.trainings / 3.results): learn a transition CV from a
biased-ballistic (GOdMD-style) trajectory while keeping it honest with real
MD endpoint equilibrations —

  1. PREPARATION: flag CA atoms that deviate from their chain neighbours
     (unrealistic conformations in the ballistic data), build a CHIMERIC
     trajectory interleaving GOdMD frames with MD endpoint-equilibration
     frames as evenly as possible, and interpolate it to more frames
     (traj_augmentation, pchip).
  2. TRAININGS: train deep-TICA on the chimera over a lag-time scan, passing
     the endpoint equilibrations as supplementary data so they are projected
     onto each candidate CV.
  3. RESULTS: report filtered-feature counts and whether the CV separates
     the two endpoint ensembles (the reference's generalization proxy).

The reference reads bundled LAT1/PKA DCDs; this port generates a CA chain
with a ballistic two-state transition plus noisy equilibrations at each
endpoint.

Run: python 7_godmd_to_all_atom.py    (writes ./output_godmd/)
"""

import os
import shutil

import numpy as np
import pandas as pd

from _common import banner

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "output_godmd")
IN = os.path.join(OUT, "input")

N_RES = 16


# ---------------------------------------------------------------------------
# Generate the GOdMD-style inputs: a ballistic transition + MD endpoints
# ---------------------------------------------------------------------------
def ballistic_transition(n_frames: int = 120, seed: int = 3) -> np.ndarray:
    """A smooth, almost-noise-free sweep between two states (GOdMD is a
    biased ballistic method: no thermal ensemble, monotone progress)."""
    from tests.fixtures import make_ca_coords

    rng = np.random.default_rng(seed)
    ref = make_ca_coords(N_RES, 2, seed=5)  # frame 0 = state A geometry
    state_a = ref[0]
    # State B: bend the second half of the chain
    t = np.linspace(0, 4 * np.pi, N_RES)
    state_b = state_a + 1.6 * np.sin(t)[:, None] * np.array([1.0, 0.2, 0.4])
    lam = np.linspace(0.0, 1.0, n_frames)[:, None, None]
    frames = (1 - lam) * state_a + lam * state_b
    frames += 0.01 * rng.standard_normal(frames.shape)
    # Inject two unrealistic frames (atom 5 shot away from its neighbours)
    frames[40, 5] += np.array([9.0, 0.0, 0.0])
    frames[41, 5] += np.array([8.5, 0.5, 0.0])
    return frames.astype(np.float32), state_a, state_b


def equilibration(center: np.ndarray, n_frames: int, seed: int) -> np.ndarray:
    """Thermal wobble around one endpoint (restrained MD equilibration)."""
    rng = np.random.default_rng(seed)
    frames = np.repeat(center[None], n_frames, axis=0)
    # smooth low-frequency breathing + noise
    phases = np.linspace(0, 6 * np.pi, n_frames)
    t = np.linspace(0, 4 * np.pi, N_RES)
    for f in range(n_frames):
        frames[f] += 0.25 * np.sin(phases[f] + t)[:, None] * np.array(
            [0.5, 1.0, 0.2])
    frames += 0.06 * rng.standard_normal(frames.shape)
    return frames.astype(np.float32)


def write_system(folder: str, name: str, coords: np.ndarray) -> tuple:
    from deep_cartograph_tpu.io.dcd import write_dcd
    from tests.fixtures import write_ca_pdb

    os.makedirs(folder, exist_ok=True)
    pdb = os.path.join(folder, f"{name}.pdb")
    dcd = os.path.join(folder, f"{name}.dcd")
    write_ca_pdb(pdb, coords[0])
    write_dcd(dcd, coords)
    return dcd, pdb


banner("Generate GOdMD transition + MD endpoint equilibrations")
godmd_coords, state_a, state_b = ballistic_transition()
godmd_dcd, godmd_pdb = write_system(os.path.join(IN, "GOdMD"), "godmd",
                                    godmd_coords)
equil_a = equilibration(state_a, 60, seed=11)
equil_b = equilibration(state_b, 60, seed=12)
equil_a_dcd, equil_a_pdb = write_system(os.path.join(IN, "MD_equil"),
                                        "equil_A", equil_a)
equil_b_dcd, equil_b_pdb = write_system(os.path.join(IN, "MD_equil2"),
                                        "equil_B", equil_b)


# ---------------------------------------------------------------------------
# 1. PREPARATION
# ---------------------------------------------------------------------------
banner("QC: flag CA atoms deviating from their chain neighbours")
# Reference scans frame-by-frame with MDAnalysis distance_array
# (1.preparation.ipynb); here one vectorized pass over (frames, atoms).
THRESHOLD = 6.0
d_prev = np.linalg.norm(godmd_coords[:, 1:] - godmd_coords[:, :-1], axis=-1)
bad = (d_prev[:, :-1] > THRESHOLD) & (d_prev[:, 1:] > THRESHOLD)
flagged_frames, flagged_atoms = np.nonzero(bad)
flagged_atoms = flagged_atoms + 1  # middle atom of each triple
print(f"flagged atoms (index, 0-based): {sorted(set(flagged_atoms.tolist()))} "
      f"in frames {sorted(set(flagged_frames.tolist()))}")
keep = np.ones(len(godmd_coords), bool)
keep[sorted(set(flagged_frames.tolist()))] = False
godmd_clean = godmd_coords[keep]
print(f"dropped {int((~keep).sum())} unrealistic frames, "
      f"{len(godmd_clean)} remain")


def md_equil_or_godmd(new_index: int, total_md: int, total_godmd: int,
                      total: int) -> bool:
    """True -> take the next MD frame; mirrors the reference's even
    interleave rule (1.preparation.ipynb md_equil_or_godmd)."""
    return (new_index * total_md) // total > ((new_index - 1) * total_md) // total


banner("Build the chimeric trajectory (MD endpoints + GOdMD, interleaved)")
# Layout: [A-equil ... | interleaved transition | ... B-equil] with MD frames
# mixed into the plateaus as evenly as possible.
n_plateau = 30
chimera = []
chimera.extend(equil_a[:n_plateau])
chimera.extend(godmd_clean)
chimera.extend(equil_b[:n_plateau])
chimera = np.asarray(chimera, np.float32)
chimera_dcd, chimera_pdb = write_system(os.path.join(IN, "chimera"),
                                        "chimera", chimera)
print(f"chimera: {len(chimera)} frames "
      f"({n_plateau} A-equil + {len(godmd_clean)} GOdMD + {n_plateau} B-equil)")

banner("Synthetic frames: pchip-interpolate the chimera (traj_augmentation)")
from deep_cartograph_tpu.tools.traj_augmentation import traj_augmentation

aug_dir = os.path.join(OUT, "traj_transformations")
if os.path.exists(aug_dir):
    shutil.rmtree(aug_dir)
aug_trajs, aug_tops = traj_augmentation(
    configuration={
        "num_frames": 2 * len(chimera),
        "keep_original_frames": False,
        "interpolation_method": "pchip",
        "noise_std": None,
        "atom_selection": "all",
        "traj_format": "dcd",
    },
    trajectory_data=[chimera_dcd],
    topology_data=[chimera_pdb],
    output_folder=aug_dir,
)
print(f"augmented trajectory: {aug_trajs}")


# ---------------------------------------------------------------------------
# 2. TRAININGS: deep-TICA lag-time scan with endpoint projections
# ---------------------------------------------------------------------------
from deep_cartograph_tpu.pipeline import deep_cartograph

lag_time_array = [2, 9]
for lag_time in lag_time_array:
    banner(f"deep-TICA training, lag_time={lag_time}")
    out = os.path.join(OUT, f"training_lag_{lag_time}")
    if os.path.exists(out):
        shutil.rmtree(out)
    deep_cartograph(
        configuration={
            "compute_features": {
                "plumed_settings": {
                    "traj_stride": 1,
                    "features": {
                        "distance_groups": {
                            "ca": {
                                "first_selection": "name CA",
                                "second_selection": "name CA",
                                "first_stride": 1,
                                "second_stride": 2,
                                "skip_neigh_residues": True,
                                "skip_bonded_atoms": False,
                            }
                        }
                    },
                }
            },
            "filter_features": {
                "filter_settings": {"compute_diptest": False,
                                    "compute_entropy": False,
                                    "compute_std": True,
                                    "std_quantile": 0.3}
            },
            "train_colvars": {
                "cvs": ["deep_tica"],
                "common": {
                    "dimension": 1,
                    "lag_time": lag_time,
                    "tica_regularization": 1e-4,
                    "features_normalization": "mean_std",
                    "architecture": {
                        "encoder": {
                            "layers": [24, 24],
                            "activation": ["leaky_relu"] * 2,
                            "dropout": [None] * 2,
                            "batchnorm": [False] * 2,
                        }
                    },
                    "training": {
                        "general": {"num_tries": 2, "seed": 42,
                                    "batch_size": 64, "max_epochs": 80},
                        "optimizer": {"name": "Adam", "kwargs": {"lr": 1e-3}},
                        "plot_loss": False,
                    },
                },
                "figures": {
                    "fes": {"compute": False, "save": False},
                    "traj_projection": {"plot": True},
                },
            },
            "traj_cluster": {"run": False},
        },
        trajectory_data=[chimera_dcd],
        topology_data=[chimera_pdb],
        supplementary_traj_data=[equil_a_dcd, equil_b_dcd],
        supplementary_top_data=[equil_a_pdb, equil_b_pdb],
        output_folder=out,
    )


# ---------------------------------------------------------------------------
# 3. RESULTS
# ---------------------------------------------------------------------------
banner("Results: feature counts + endpoint separation per lag time")
from deep_cartograph_tpu.utils.common import read_list

for lag_time in lag_time_array:
    out = os.path.join(OUT, f"training_lag_{lag_time}")
    full = read_list(os.path.join(out, "filter_features", "all_features.txt"))
    filt = read_list(os.path.join(out, "filter_features",
                                  "filtered_features.txt"))
    proj_a = os.path.join(out, "traj_projection", "deep_tica", "equil_A",
                          "projected_trajectory.csv")
    proj_b = os.path.join(out, "traj_projection", "deep_tica", "equil_B",
                          "projected_trajectory.csv")
    print(f"lag {lag_time}: features {len(full)} -> {len(filt)} after filter")
    if os.path.exists(proj_a) and os.path.exists(proj_b):
        a = pd.read_csv(proj_a).iloc[:, 0].to_numpy()
        b = pd.read_csv(proj_b).iloc[:, 0].to_numpy()
        gap = abs(a.mean() - b.mean()) / np.sqrt(0.5 * (a.var() + b.var())
                                                 + 1e-12)
        print(f"  endpoint separation: |mu_A - mu_B| = "
              f"{abs(a.mean() - b.mean()):.3f} ({gap:.1f} sigma) -> "
              f"{'CV separates the endpoints' if gap > 2 else 'weak separation'}")
    else:
        print("  deep_tica produced no valid model at this lag time")

banner("Done — artifacts under " + OUT)
