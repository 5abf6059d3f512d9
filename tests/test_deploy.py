"""FramesToCV serving pipeline: fused featurize+project equals the
two-step tool path."""

import numpy as np
import pytest

from deep_cartograph_tpu.deploy import FramesToCV
from deep_cartograph_tpu.geom.engine import Featurizer
from deep_cartograph_tpu.io.colvars import write_colvars
from deep_cartograph_tpu.io.topology import Topology
from deep_cartograph_tpu.cv import cv_calculators_map
from tests.test_cv import base_config


@pytest.fixture(scope="module")
def trained(tmp_path_factory, ca_system):
    root = tmp_path_factory.mktemp("deploy")
    labels = [
        "dist-@CA_1-@CA_5",
        "dist-@CA_2-@CA_9",
        "sin-@CA_1-@CA_2-@CA_3-@CA_4",
        "cos-@CA_1-@CA_2-@CA_3-@CA_4",
    ]
    top = Topology.from_pdb(ca_system.pdb_path)
    features = Featurizer(top, labels).featurize_trajectory(ca_system.dcd_path)
    colvars = str(root / "colvars.dat")
    t = np.arange(features.shape[0], dtype=np.float32)
    write_colvars(colvars, np.column_stack([t, features]),
                  ["time"] + labels, fmt="%.6f")
    return root, labels, colvars, features


@pytest.mark.parametrize("cv_name", ["pca", "deep_tica"])
def test_frames_to_cv_matches_two_step(cv_name, trained, ca_system, tmp_path):
    root, labels, colvars, features = trained
    calc = cv_calculators_map[cv_name](
        configuration=base_config(), output_path=str(tmp_path)
    )
    calc.load_training_data([colvars], [ca_system.pdb_path],
                            features_list=labels)
    projection = calc.run()
    assert projection is not None

    top = Topology.from_pdb(ca_system.pdb_path)
    pipeline = FramesToCV(calc, top)
    fused = pipeline(ca_system.coords)
    # features written at %.6f -> small quantization vs in-memory path
    np.testing.assert_allclose(
        fused, projection.to_numpy(), atol=5e-3
    )


def test_frames_to_cv_from_model_zip(trained, ca_system, tmp_path):
    import os

    root, labels, colvars, features = trained
    calc = cv_calculators_map["pca"](
        configuration=base_config(), output_path=str(tmp_path)
    )
    calc.load_training_data([colvars], [ca_system.pdb_path],
                            features_list=labels)
    projection = calc.run()
    model_zip = os.path.join(str(tmp_path), "pca", "model.zip")
    pipeline = FramesToCV.from_model_zip(
        model_zip, ca_system.pdb_path, str(tmp_path / "serve")
    )
    fused = pipeline(ca_system.coords)
    np.testing.assert_allclose(fused, projection.to_numpy(), atol=5e-3)


def test_frames_to_cv_auto_shards_multi_device(trained, ca_system, tmp_path):
    """On multi-device backends FramesToCV shards the serving batch's frame
    axis over the mesh automatically, with identical values (incl. uneven
    batch sizes needing edge padding)."""
    import jax
    import jax.numpy as jnp

    root, labels, colvars, features = trained
    calc = cv_calculators_map["pca"](
        configuration=base_config(), output_path=str(tmp_path)
    )
    calc.load_training_data([colvars], [ca_system.pdb_path],
                            features_list=labels)
    assert calc.run() is not None

    assert len(jax.devices()) > 1
    pipe = FramesToCV(calc, Topology.from_pdb(ca_system.pdb_path))
    assert pipe._sharding is not None

    coords = ca_system.coords[:29]  # 29 % 8 != 0: pad path
    sharded_out = pipe(coords)
    single_out = np.asarray(pipe._jitted(jnp.asarray(coords, jnp.float32)))
    assert sharded_out.shape == single_out.shape
    np.testing.assert_allclose(sharded_out, single_out, atol=1e-6)
