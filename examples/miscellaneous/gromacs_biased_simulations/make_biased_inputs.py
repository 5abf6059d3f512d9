"""Produce a GROMACS+PLUMED biased-simulation input set from a trained VAE CV.

Port of /root/reference/examples/miscellaneous/gromacs_biased_simulations:
the reference ships the END PRODUCT of this workflow (a
plumed_input_vae_opes_metad_explore.dat + vae_model.pt + plumed_topology.pdb
for protein 1IKU, consumed by `gmx mdrun -plumed ...`, cf. run_md.sl). This
script runs the producing side on a generated system:

  1. featurize + train a 2D VAE CV (virtual CA torsions, like config_mix),
  2. export the biased PLUMED input with the OPES_METAD_EXPLORE sampler
     (train_colvars emits plumed_vae_biased.zip via the enhanced-sampling
     assembler, deep_cartograph_tpu/plumed/assembler.py),
  3. unpack the zip here: plumed_input_vae_opes_metad_explore.dat,
     vae_weights.pt (TorchScript, PLUMED's PYTORCH_MODEL contract),
     plumed_topology.pdb.

The resulting folder is what run_md.sh feeds to GROMACS on a machine where
GROMACS+PLUMED are installed (they are not part of this framework).

Run: python make_biased_inputs.py    (writes ./output/)
"""

import os
import shutil
import sys
import zipfile

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.abspath(os.path.join(HERE, "..", "..", "..")))

OUT = os.path.join(HERE, "output")


def main() -> None:
    from tests.fixtures import make_ca_system
    from deep_cartograph_tpu.tools.compute_features import compute_features
    from deep_cartograph_tpu.tools.train_colvars import train_colvars

    if os.path.exists(OUT):
        shutil.rmtree(OUT)
    system = make_ca_system(os.path.join(OUT, "input"), n_residues=16,
                            n_frames=200, seed=9)

    colvars_paths = compute_features(
        configuration={
            "plumed_settings": {
                "traj_stride": 1,
                "features": {
                    "dihedral_groups": {
                        "ca_tors": {
                            "selection": "name CA",
                            "periodic_encoding": True,
                            "search_mode": "virtual",
                        }
                    }
                },
            }
        },
        trajectory_data=[system.dcd_path],
        topology_data=[system.pdb_path],
        output_folder=os.path.join(OUT, "compute_features"),
    )

    train_colvars(
        configuration={
            "cvs": ["vae"],
            "common": {
                "dimension": 2,
                "features_normalization": "mean_std",
                "architecture": {"encoder": {"layers": [32, 16, 8],
                                             "dropout": 0.1}},
                "training": {
                    "general": {"num_tries": 1, "seed": 42, "batch_size": 64,
                                "max_epochs": 150},
                    "optimizer": {"name": "Adam", "kwargs": {"lr": 1e-3}},
                    "kl_annealing": {"type": "linear", "start_beta": 0.0,
                                     "max_beta": 0.01, "start_epoch": 50,
                                     "n_epochs_anneal": 50},
                    "plot_loss": False,
                },
                # The enhanced-sampling export this example exists for:
                "bias": {
                    "method": "opes_metad_explore",
                    "args": {"temperature": 300, "barrier": 20,
                             "pace": 500},
                },
            },
            "figures": {"fes": {"compute": False, "save": False},
                        "traj_projection": {"plot": False}},
        },
        train_colvars_paths=colvars_paths,
        train_topologies=[system.pdb_path],
        trajectory_names=["ca_example"],
        output_folder=os.path.join(OUT, "train_colvars"),
    )

    biased_zip = os.path.join(OUT, "train_colvars", "vae", "traj_data",
                              "ca_example", "plumed_inputs",
                              "plumed_vae_biased.zip")
    deploy = os.path.join(OUT, "deploy")
    os.makedirs(deploy, exist_ok=True)
    with zipfile.ZipFile(biased_zip) as zf:
        zf.extractall(deploy)
    print("\nDeployment folder for `gmx mdrun -plumed ...`:")
    for f in sorted(os.listdir(deploy)):
        print(f"  {deploy}/{f}")
    dat = [f for f in os.listdir(deploy) if f.endswith(".dat")][0]
    print(f"\n--- {dat} (head) ---")
    with open(os.path.join(deploy, dat)) as fh:
        for i, line in enumerate(fh):
            if i >= 12:
                print("  ...")
                break
            print(" ", line.rstrip())


if __name__ == "__main__":
    main()
