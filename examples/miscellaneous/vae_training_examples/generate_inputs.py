"""Generate the demo inputs the run scripts expect.

The reference's vae_training_examples point at GOdMD trajectories plus MD
endpoint equilibrations on a cluster filesystem
(/root/reference/examples/miscellaneous/vae_training_examples/run_*.sl);
this port generates equivalent synthetic data:

  deepCarto_input/GOdMD_traj/            ballistic transition (training)
  deepCarto_input/GOdMD_top/
  deepCarto_input/MDequilibration_traj/  endpoint wobble (supplementary)
  deepCarto_input/MDequilibration_top/

Run: python generate_inputs.py
"""

import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.abspath(os.path.join(HERE, "..", "..", "..")))

import numpy as np

from tests.fixtures import make_ca_coords, write_ca_pdb


def main() -> None:
    from deep_cartograph_tpu.io.dcd import write_dcd

    rng = np.random.default_rng(7)
    n_res, n_frames = 16, 150

    base = os.path.join(HERE, "deepCarto_input")
    for sub in ("GOdMD_traj", "GOdMD_top", "MDequilibration_traj",
                "MDequilibration_top"):
        os.makedirs(os.path.join(base, sub), exist_ok=True)

    # Ballistic transition between two CA states
    ref = make_ca_coords(n_res, 2, seed=5)
    state_a = ref[0]
    t = np.linspace(0, 4 * np.pi, n_res)
    state_b = state_a + 1.6 * np.sin(t)[:, None] * np.array([1.0, 0.2, 0.4])
    lam = np.linspace(0, 1, n_frames)[:, None, None]
    godmd = ((1 - lam) * state_a + lam * state_b
             + 0.02 * rng.standard_normal((n_frames, n_res, 3)))
    write_ca_pdb(os.path.join(base, "GOdMD_top", "godmd.pdb"),
                 godmd[0].astype(np.float32))
    write_dcd(os.path.join(base, "GOdMD_traj", "godmd.dcd"),
              godmd.astype(np.float32))

    # Endpoint equilibration (state A wobble), projected as supplementary
    equil = np.repeat(state_a[None], 80, axis=0)
    equil += 0.15 * rng.standard_normal(equil.shape)
    write_ca_pdb(os.path.join(base, "MDequilibration_top", "equil.pdb"),
                 equil[0].astype(np.float32))
    write_dcd(os.path.join(base, "MDequilibration_traj", "equil.dcd"),
              equil.astype(np.float32))

    print(f"inputs written under {base}")


if __name__ == "__main__":
    main()
