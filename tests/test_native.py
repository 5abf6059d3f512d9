"""Native extension tests: XTC codec and batch dip statistics."""

import numpy as np
import pytest

from deep_cartograph_tpu.native.build import load_native

native = load_native()
needs_native = pytest.mark.skipif(native is None, reason="native build failed")


@needs_native
def test_xtc_roundtrip(tmp_path, rng):
    from deep_cartograph_tpu.io.xtc import count_xtc_frames, read_xtc, write_xtc

    coords = (rng.standard_normal((9, 40, 3)) * 9).astype(np.float32)
    path = str(tmp_path / "t.xtc")
    write_xtc(path, coords)
    back = read_xtc(path)
    assert back.shape == coords.shape
    assert count_xtc_frames(path) == 9
    # XTC quantizes at precision 1000/nm -> 0.01 A worst case (here: 0.005)
    assert np.abs(back - coords).max() < 0.02
    strided = read_xtc(path, start=2, stop=8, stride=3)
    np.testing.assert_allclose(strided, back[2:8:3])


@needs_native
def test_xtc_via_traj_dispatch(tmp_path, rng):
    from deep_cartograph_tpu.io.traj import get_num_frames, read_traj, write_traj

    coords = (rng.standard_normal((5, 20, 3)) * 9).astype(np.float32)
    path = str(tmp_path / "d.xtc")
    write_traj(path, coords)
    assert get_num_frames(path) == 5
    back = read_traj(path)
    assert np.abs(back - coords).max() < 0.02


@needs_native
def test_native_dip_matches_python(rng):
    from deep_cartograph_tpu.stats.descriptors import dip_statistics_batch
    from deep_cartograph_tpu.stats.dip import dip_statistic

    data = np.column_stack(
        [
            rng.standard_normal(300),
            np.concatenate(
                [rng.standard_normal(150) - 3, rng.standard_normal(150) + 3]
            ),
            rng.random(300),
        ]
    ).astype(np.float32)
    native_dips = dip_statistics_batch(data)
    assert native_dips is not None
    for j in range(data.shape[1]):
        expected = dip_statistic(data[:, j])
        assert abs(native_dips[j] - expected) < 1e-12, j


def test_native_dcd_prefetch_loader(tmp_path, rng):
    """Native background-thread DCD loader matches the Python codec."""
    from deep_cartograph_tpu.io.dcd import (
        iter_dcd_chunks_prefetch,
        read_dcd,
        write_dcd,
    )

    coords = (rng.standard_normal((57, 9, 3)) * 12).astype(np.float32)
    path = str(tmp_path / "p.dcd")
    write_dcd(path, coords)
    chunks = list(iter_dcd_chunks_prefetch(path, chunk=16))
    assert [c.shape[0] for c in chunks] == [16, 16, 16, 9]
    np.testing.assert_allclose(np.concatenate(chunks), coords, atol=0)
    np.testing.assert_allclose(read_dcd(path), coords, atol=0)


def test_native_dcd_loader_lifecycle(tmp_path, rng):
    """Early close with queued chunks, oversized chunk, EOF, missing file."""
    import ctypes

    from deep_cartograph_tpu.io.dcd import write_dcd
    from deep_cartograph_tpu.native.build import load_native

    lib = load_native()
    if lib is None or not hasattr(lib, "dcd_open"):
        import pytest

        pytest.skip("native library unavailable")

    coords = (rng.standard_normal((100, 7, 3)) * 8).astype(np.float32)
    path = str(tmp_path / "t.dcd")
    write_dcd(path, coords)

    for depth in (1, 8):
        h = lib.dcd_open(path.encode(), 16, depth)
        buf = np.empty((16, 7, 3), np.float32)
        assert lib.dcd_next_chunk(
            h, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        ) == 16
        lib.dcd_close(h)  # queued chunks discarded, no deadlock

    h = lib.dcd_open(path.encode(), 512, 2)
    big = np.empty((512, 7, 3), np.float32)
    ptr = big.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    assert lib.dcd_next_chunk(h, ptr) == 100
    np.testing.assert_allclose(big[:100], coords, atol=0)
    assert lib.dcd_next_chunk(h, ptr) == 0  # clean EOF
    lib.dcd_close(h)

    assert not lib.dcd_open(str(tmp_path / "nope.dcd").encode(), 16, 2)


def test_xtc_batch_decode_matches_serial(tmp_path):
    """The OpenMP batch decoder (xtc_decompress_frames_batch) returns the
    same coordinates as the per-frame path; read_xtc uses it whenever the
    symbol exists (gains appear on multi-core hosts)."""
    import deep_cartograph_tpu.io.xtc as xtc_mod
    from deep_cartograph_tpu.io.xtc import read_xtc, write_xtc

    rng = np.random.default_rng(3)
    coords = (rng.standard_normal((25, 40, 3)) * 4).astype(np.float32)
    path = str(tmp_path / "traj.xtc")
    write_xtc(path, coords)

    lib = xtc_mod._lib()
    assert hasattr(lib, "xtc_decompress_frames_batch")
    batch = read_xtc(path)

    class _NoBatch:  # hide the batch symbol -> serial fallback
        xtc_decompress_coords = lib.xtc_decompress_coords

    orig = xtc_mod._lib
    xtc_mod._lib = lambda: _NoBatch
    try:
        serial = read_xtc(path)
    finally:
        xtc_mod._lib = orig

    np.testing.assert_array_equal(batch, serial)
    np.testing.assert_allclose(batch, coords, atol=2e-2)  # xtc precision

    # slicing semantics identical through the indexed path
    sliced = read_xtc(path, start=3, stop=20, stride=4)
    np.testing.assert_array_equal(sliced, batch[3:20:4])


def test_xtc_truncated_file_raises_xtcerror(tmp_path):
    """Truncated XTC files raise the documented XTCError from the frame-table
    walk, not a raw struct.error."""
    import pytest as _pytest

    from deep_cartograph_tpu.io.xtc import XTCError, read_xtc, write_xtc

    rng = np.random.default_rng(1)
    coords = (rng.standard_normal((6, 40, 3)) * 4).astype(np.float32)
    path = str(tmp_path / "full.xtc")
    write_xtc(path, coords)
    data = open(path, "rb").read()

    # cut inside a later frame's compressed header region
    for cut in (len(data) - 5, len(data) // 2 + 60):
        trunc = str(tmp_path / f"trunc_{cut}.xtc")
        with open(trunc, "wb") as fh:
            fh.write(data[:cut])
        with _pytest.raises(XTCError):
            read_xtc(trunc)


def test_colvars_parse_short_row_returns_error(tmp_path):
    """A truncated data row must yield the -1 shape-mismatch error, not
    silently consume the next line's numbers."""
    from deep_cartograph_tpu.native.build import load_native

    lib = load_native()
    if lib is None:
        import pytest

        pytest.skip("native library unavailable")
    text = (
        "#! FIELDS time a b\n"
        "0.0 1.0 2.0\n"
        "1.0 3.0\n"          # short row
        "2.0 4.0 5.0\n"
    ).encode()
    import ctypes

    import numpy as np

    out = np.empty((3, 3), np.float32)
    n = lib.colvars_parse(
        text, len(text), 3,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), 3,
    )
    assert n == -1
