"""Physics-grounded validation on the Müller-Brown potential: the sampler
explores multiple basins and learned CVs separate them."""

import numpy as np
import pytest

from deep_cartograph_tpu.data.muller_brown import (
    basin_labels,
    potential,
    sample_trajectory,
)


@pytest.fixture(scope="module")
def mb_traj():
    return sample_trajectory(n_frames=4000, stride=20, kt=20.0, seed=3)


def test_sampler_stays_bounded_and_visits_basins(mb_traj):
    assert np.isfinite(mb_traj).all()
    assert np.abs(mb_traj).max() < 3.0
    labels = basin_labels(mb_traj)
    # at kT=20 the walker crosses between at least two basins
    visited = set(np.unique(labels))
    assert len(visited) >= 2
    # energies stay in a physical range (near/above the global minimum ~ -146)
    energies = np.asarray(potential(mb_traj))
    assert energies.min() > -160
    assert np.median(energies) < 0


def test_deep_tica_separates_basins(mb_traj, tmp_path):
    """The leading deep-TICA CV on (x, y) input should discriminate the two
    main metastable basins."""
    from tests.test_cv import base_config
    from deep_cartograph_tpu.cv import cv_calculators_map
    from deep_cartograph_tpu.io.colvars import write_colvars
    from tests.fixtures import write_ca_pdb
    from deep_cartograph_tpu.data.muller_brown import as_ca_trajectory

    labels = ["dist-@CA_1-@CA_2", "dist-@CA_1-@CA_3"]  # encode x and y
    coords = as_ca_trajectory(mb_traj)
    pdb = str(tmp_path / "mb.pdb")
    write_ca_pdb(pdb, coords[0])

    from deep_cartograph_tpu.geom.engine import Featurizer
    from deep_cartograph_tpu.io.topology import Topology

    top = Topology.from_pdb(pdb)
    features = Featurizer(top, labels)(coords)
    colvars = str(tmp_path / "colvars.dat")
    t = np.arange(features.shape[0], dtype=np.float32)
    write_colvars(colvars, np.column_stack([t, features]),
                  ["time"] + labels, fmt="%.6f")

    cfg = base_config()
    cfg["dimension"] = 1
    cfg["lag_time"] = 5
    cfg["training"]["general"]["max_epochs"] = 60
    cfg["training"]["general"]["batch_size"] = 256
    cfg["training"]["optimizer"]["kwargs"]["lr"] = 5e-3
    calc = cv_calculators_map["deep_tica"](
        configuration=cfg, output_path=str(tmp_path)
    )
    calc.load_training_data([colvars], [pdb], features_list=labels)
    projection = calc.run()
    assert projection is not None

    cv = projection.to_numpy()[:, 0]
    basins = basin_labels(mb_traj)
    # Use the two most-populated basins
    counts = np.bincount(basins, minlength=3)
    top2 = np.argsort(counts)[-2:]
    cv_a = cv[basins == top2[0]]
    cv_b = cv[basins == top2[1]]
    # separation: basin means differ by > 1 pooled std
    pooled = np.sqrt((cv_a.var() + cv_b.var()) / 2)
    assert abs(cv_a.mean() - cv_b.mean()) > 1.0 * pooled
