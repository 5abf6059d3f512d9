"""Quantized host->device transport (io/upload.py).

The reference ships coordinates as XTC 1e-3 A fixed point through
MDAnalysis (reference modules/md/__init__.py); our int16 transport is the
same precision class applied to the host->device link instead of the disk
format. These tests pin the error bound, the mode plumbing, and end-to-end
featurize parity through both the plain and frame-sharded evaluators.
"""

import numpy as np
import pytest

from deep_cartograph_tpu.io.upload import (
    dequantize_coords,
    quantization_step,
    quantize_coords,
    resolve_upload_mode,
    upload_coords,
)


def test_quantize_roundtrip_error_bound(rng):
    x = rng.uniform(-40.0, 60.0, (17, 9, 3)).astype(np.float32)
    q, scale, offset = quantize_coords(x)
    assert q.dtype == np.int16
    back = np.asarray(dequantize_coords(q, scale, offset))
    err = np.abs(back - x)
    # per-axis bound: half a quantization step (+ f32 rounding slack)
    for ax in range(3):
        assert err[..., ax].max() <= scale[ax] * 0.5 + 1e-6
    # 100 A span -> ~1.5e-3 A step: the XTC precision class
    assert quantization_step(scale) < 2e-3


def test_quantize_degenerate_axis_exact(rng):
    x = rng.uniform(0, 5, (8, 4, 3)).astype(np.float32)
    x[..., 2] = 1.25  # zero-span axis
    q, scale, offset = quantize_coords(x)
    back = np.asarray(dequantize_coords(q, scale, offset))
    np.testing.assert_array_equal(back[..., 2], x[..., 2])
    assert np.all(q[..., 2] == 0)


def test_upload_coords_modes(rng):
    x = rng.uniform(-3, 3, (5, 6, 3)).astype(np.float32)
    exact = np.asarray(upload_coords(x, mode="float32"))
    np.testing.assert_array_equal(exact, x)
    approx = np.asarray(upload_coords(x, mode="int16"))
    assert np.abs(approx - x).max() < 2e-4  # 6 A span
    with pytest.raises(ValueError):
        upload_coords(x, mode="bf16")


def test_resolve_upload_mode(monkeypatch):
    assert resolve_upload_mode("int16") == "int16"
    assert resolve_upload_mode("float32") == "float32"
    monkeypatch.delenv("DC_TPU_UPLOAD", raising=False)
    assert resolve_upload_mode("auto") == "float32"
    monkeypatch.setenv("DC_TPU_UPLOAD", "int16")
    assert resolve_upload_mode("auto") == "int16"
    with pytest.raises(ValueError):
        resolve_upload_mode("int8")


def test_featurize_trajectory_int16_parity(ca_system, tmp_path):
    """End-to-end: int16 transport changes features by less than the
    feature noise floor. Runs the default (frame-sharded on the 8-device
    test mesh) evaluator, so the sharded _eval_quantized branch is hit."""
    from deep_cartograph_tpu.geom.engine import Featurizer
    from deep_cartograph_tpu.io.dcd import write_dcd
    from deep_cartograph_tpu.io.topology import Topology

    traj = str(tmp_path / "t.dcd")
    write_dcd(traj, ca_system.coords[:24])
    top = Topology.from_file(ca_system.pdb_path)
    labels = ["dist-@CA_1-@CA_5", "dist-@CA_2-@CA_7",
              "sin-@CA_1-@CA_2-@CA_3-@CA_4", "cos-@CA_1-@CA_2-@CA_3-@CA_4"]

    for device in ("auto", "cpu"):  # sharded wrapper and plain evaluator
        f = Featurizer(top, labels, device=device)
        exact = f.featurize_trajectory(traj, upload="float32")
        approx = f.featurize_trajectory(traj, upload="int16")
        assert exact.shape == approx.shape
        # distances in nm (~A span / 10): 1e-3 A coordinate error stays
        # well under 1e-3 nm in any distance/torsion feature
        np.testing.assert_allclose(approx, exact, atol=1e-3)
        assert np.abs(approx - exact).max() > 0  # transport really quantized


def test_featurize_trajectory_env_auto(ca_system, tmp_path, monkeypatch):
    from deep_cartograph_tpu.geom.engine import Featurizer
    from deep_cartograph_tpu.io.dcd import write_dcd
    from deep_cartograph_tpu.io.topology import Topology

    traj = str(tmp_path / "t.dcd")
    write_dcd(traj, ca_system.coords[:8])
    top = Topology.from_file(ca_system.pdb_path)
    f = Featurizer(top, ["dist-@CA_1-@CA_5"], device="cpu")
    monkeypatch.setenv("DC_TPU_UPLOAD", "int16")
    out = f.featurize_trajectory(traj)  # upload="auto" default
    exact = f.featurize_trajectory(traj, upload="float32")
    np.testing.assert_allclose(out, exact, atol=1e-3)
