"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Tests never need real TPU hardware; multi-device sharding paths are exercised
via --xla_force_host_platform_device_count (the JAX-native fake backend).
"""

import os

# jax may already be imported by the environment's sitecustomize, so env vars
# alone are not enough: set XLA flags, then override the platform via
# jax.config BEFORE any backend initialization.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def ca_system(tmp_path_factory):
    """Synthetic CA-only test system: PDB topology + DCD trajectory.

    Mirrors the shape of the reference's CA_example fixture (a small
    coarse-grained chain) but is generated programmatically.
    """
    from tests.fixtures import make_ca_system

    root = tmp_path_factory.mktemp("ca_system")
    return make_ca_system(str(root), n_residues=12, n_frames=60, seed=7)
