"""IO layer tests: PDB parsing, selections, DCD/TRR round-trips, colvars."""

import numpy as np
import pytest

from deep_cartograph_tpu.io.colvars import (
    check,
    read_colvars,
    read_column_names,
    read_features_matrix,
    write_colvars,
)
from deep_cartograph_tpu.io.dcd import read_dcd, read_dcd_header, write_dcd
from deep_cartograph_tpu.io.topology import Topology
from deep_cartograph_tpu.io.traj import read_traj, write_traj
from deep_cartograph_tpu.io.trr import read_trr, write_trr


def test_pdb_parse_roundtrip(ca_system, tmp_path):
    top = Topology.from_pdb(ca_system.pdb_path)
    assert top.n_atoms == ca_system.n_residues
    assert list(top.names) == ["CA"] * top.n_atoms
    assert top.resids[0] == 1
    np.testing.assert_allclose(
        top.positions, ca_system.coords[0], atol=1e-3
    )
    out = tmp_path / "roundtrip.pdb"
    top.write_pdb(str(out))
    top2 = Topology.from_pdb(str(out))
    np.testing.assert_allclose(top2.positions, top.positions, atol=1e-3)
    assert list(top2.resnames) == list(top.resnames)


def test_selections(ca_system):
    top = Topology.from_pdb(ca_system.pdb_path)
    assert len(top.select("all")) == top.n_atoms
    assert len(top.select("name CA")) == top.n_atoms
    assert len(top.select("name H*")) == 0
    assert len(top.select("not name H*")) == top.n_atoms
    assert len(top.select("protein and name CA")) == top.n_atoms
    assert list(top.select("resid 2:4")) == [1, 2, 3]
    assert list(top.select("resid 1 3")) == [0, 2]
    assert len(top.select("resname ALA")) > 0
    assert list(top.select("(name CA) and (resid 1:2)")) == [0, 1]
    assert len(top.select("backbone")) == top.n_atoms  # CA is a backbone atom
    assert len(top.select("sidechain")) == 0
    assert top.indices_one_based("resid 1") == [1]


def test_dcd_roundtrip(tmp_path, rng):
    coords = rng.standard_normal((17, 9, 3)).astype(np.float32) * 10
    path = str(tmp_path / "t.dcd")
    write_dcd(path, coords)
    n_atoms, n_frames, has_cell, endian, _ = read_dcd_header(path)
    assert (n_atoms, n_frames, has_cell) == (9, 17, False)
    back = read_dcd(path)
    np.testing.assert_allclose(back, coords, atol=1e-6)
    # strided read
    strided = read_dcd(path, start=2, stop=11, stride=3)
    np.testing.assert_allclose(strided, coords[2:11:3], atol=1e-6)


def test_trr_roundtrip(tmp_path, rng):
    coords = rng.standard_normal((5, 7, 3)).astype(np.float32) * 10
    path = str(tmp_path / "t.trr")
    write_trr(path, coords)
    back = read_trr(path)
    np.testing.assert_allclose(back, coords, atol=1e-4)


def test_traj_dispatch(ca_system, tmp_path):
    coords = read_traj(ca_system.dcd_path, ca_system.pdb_path)
    np.testing.assert_allclose(coords, ca_system.coords, atol=1e-5)
    # write/read pdb multi-frame
    top = Topology.from_pdb(ca_system.pdb_path)
    pdb_traj = str(tmp_path / "t.pdb")
    write_traj(pdb_traj, coords[:3], top)
    back = read_traj(pdb_traj)
    np.testing.assert_allclose(back, coords[:3], atol=1e-3)


def test_colvars_roundtrip(tmp_path):
    data = np.arange(20, dtype=np.float32).reshape(5, 4)
    path = str(tmp_path / "colvars.dat")
    cols = ["time", "dist-@CA_1-@CA_3", "sin-@CA_1-@CA_2-@CA_3-@CA_4", "bias"]
    write_colvars(path, data, cols)
    assert read_column_names(path) == cols
    assert read_column_names(path, features_only=True) == cols[1:3]
    df = read_colvars(path)
    assert list(df.columns) == cols
    # ps -> ns conversion on the time column
    np.testing.assert_allclose(df["time"].to_numpy(), data[:, 0] / 1000.0)
    mat, names = read_features_matrix(path)
    assert names == cols[1:3]
    np.testing.assert_allclose(mat, data[:, 1:3])
    # subset + order enforcement
    mat2, _ = read_features_matrix(path, [cols[2], cols[1]])
    np.testing.assert_allclose(mat2, data[:, [2, 1]])
    check(path)


def test_colvars_check_rejects_nan(tmp_path):
    path = str(tmp_path / "bad.dat")
    data = np.array([[0.0, np.nan]], dtype=np.float32)
    write_colvars(path, data, ["time", "x"])
    with pytest.raises(SystemExit):
        check(path)


def test_crd_roundtrip(tmp_path, rng, ca_system):
    from deep_cartograph_tpu.io.crd import read_crd, write_crd

    coords = (rng.standard_normal((4, 12, 3)) * 9).astype(np.float32)
    path = str(tmp_path / "t.crd")
    write_crd(path, coords)
    back = read_crd(path, 12)
    np.testing.assert_allclose(back, coords, atol=1e-3)
    # via dispatch (needs topology for atom count)
    back2 = read_traj(path, ca_system.pdb_path)
    np.testing.assert_allclose(back2, coords, atol=1e-3)


def test_netcdf_roundtrip(tmp_path, rng):
    coords = (rng.standard_normal((6, 11, 3)) * 9).astype(np.float32)
    path = str(tmp_path / "t.nc")
    write_traj(path, coords)
    back = read_traj(path)
    np.testing.assert_allclose(back, coords, atol=1e-6)
    strided = read_traj(path, start=1, stop=5, stride=2)
    np.testing.assert_allclose(strided, coords[1:5:2], atol=1e-6)


def test_selection_language_full_grammar(tmp_path):
    """Selection parser edge cases: ranges, parens, precedence, wildcards,
    resname/segid/chain clauses (MDAnalysis-syntax subset used by the
    reference's configs)."""
    from deep_cartograph_tpu.io.topology import Topology

    lines = []
    atoms = [
        # serial, name, resname, chain, resid, element
        (1, "N", "ALA", "A", 1, "N"),
        (2, "CA", "ALA", "A", 1, "C"),
        (3, "C", "ALA", "A", 1, "C"),
        (4, "O", "ALA", "A", 1, "O"),
        (5, "CB", "ALA", "A", 1, "C"),
        (6, "CA", "GLY", "A", 2, "C"),
        (7, "CA", "SER", "B", 3, "C"),
        (8, "OG", "SER", "B", 3, "O"),
        (9, "HG", "SER", "B", 3, "H"),
        (10, "OW", "HOH", "B", 4, "O"),
    ]
    for s, n, rn, ch, ri, el in atoms:
        name_f = f" {n:<3}" if len(n) < 4 else n
        lines.append(
            f"ATOM  {s:>5} {name_f} {rn:<4}{ch}{ri:>4}    "
            f"{1.0*s:8.3f}{0.0:8.3f}{0.0:8.3f}  1.00  0.00          "
            f"{el:>2}\n"
        )
    pdb = tmp_path / "sys.pdb"
    pdb.write_text("".join(lines) + "END\n")
    top = Topology.from_file(str(pdb))

    def sel(s):
        return sorted(int(i) + 1 for i in top.select(s))  # 1-based serials

    assert sel("resid 1") == [1, 2, 3, 4, 5]
    assert sel("resid 1:2 and name CA") == [2, 6]
    assert sel("resname ALA GLY and name CA") == [2, 6]
    assert sel("(name CA or name CB) and not resname SER") == [2, 5, 6]
    assert sel("name O* and not name OW") == [4, 8]
    assert sel("chainID B and protein") == [7, 8, 9]
    assert sel("backbone") == [1, 2, 3, 4, 6, 7]
    assert sel("sidechain") == [5, 8, 9]
    assert sel("not protein") == [10]
    # MDAnalysis convention: index is 0-based, bynum is 1-based
    assert sel("index 3:5") == [4, 5, 6]
    assert sel("bynum 3:5") == [3, 4, 5]
    assert sel("none") == []


def test_colvars_start_stop_stride(tmp_path):
    """input_colvars start/stop/stride slicing (reference colvars.py:254-320)."""
    from deep_cartograph_tpu.io.colvars import (
        create_dataframe_from_files,
        write_colvars,
    )

    path = str(tmp_path / "c.dat")
    data = np.column_stack(
        [np.arange(20, dtype=np.float32), np.arange(20, dtype=np.float32) * 10]
    )
    write_colvars(path, data, ["time", "dist-@CA_1-@CA_3"], fmt="%.4f")
    df = create_dataframe_from_files(
        colvars_paths=[path], start=2, stop=15, stride=4
    )
    np.testing.assert_allclose(
        df["dist-@CA_1-@CA_3"].to_numpy(), [20.0, 60.0, 100.0, 140.0]
    )


def test_truncated_binary_trajectories(tmp_path):
    """Truncated binary trajectories fail loudly (TRR raises TRRError) or
    degrade explicitly (DCD reads the complete frames with a warning) —
    never a raw struct error."""
    import pytest as _pytest

    from deep_cartograph_tpu.io.dcd import read_dcd, write_dcd
    from deep_cartograph_tpu.io.trr import TRRError, read_trr, write_trr

    rng = np.random.default_rng(2)
    coords = (rng.standard_normal((6, 30, 3)) * 4).astype(np.float32)

    trr = str(tmp_path / "t.trr")
    write_trr(trr, coords)
    data = open(trr, "rb").read()
    for cut in (len(data) - 7, len(data) // 2 + 13):
        trunc = str(tmp_path / f"t_{cut}.trr")
        open(trunc, "wb").write(data[:cut])
        with _pytest.raises(TRRError):
            read_trr(trunc)

    dcd = str(tmp_path / "t.dcd")
    write_dcd(dcd, coords)
    data = open(dcd, "rb").read()
    trunc = str(tmp_path / "t_cut.dcd")
    open(trunc, "wb").write(data[: len(data) - 7])
    out = read_dcd(trunc)  # one partial frame dropped, warning logged
    assert out.shape[0] == 5
    np.testing.assert_allclose(out, coords[:5], atol=1e-6)


def test_iter_xtc_chunks_prefetch_matches_read(tmp_path):
    """The background-thread XTC chunk iterator yields the same frames as a
    full read, including strides and a ragged last chunk."""
    from deep_cartograph_tpu.io.traj import iter_frame_chunks
    from deep_cartograph_tpu.io.xtc import (
        iter_xtc_chunks_prefetch,
        read_xtc,
        write_xtc,
    )

    rng = np.random.default_rng(4)
    coords = (rng.standard_normal((53, 24, 3)) * 4).astype(np.float32)
    path = str(tmp_path / "stream.xtc")
    write_xtc(path, coords)

    full = read_xtc(path)
    chunks = list(iter_xtc_chunks_prefetch(path, chunk=16))
    assert [c.shape[0] for c in chunks] == [16, 16, 16, 5]
    np.testing.assert_array_equal(np.concatenate(chunks), full)

    # strided
    strided = np.concatenate(list(iter_xtc_chunks_prefetch(path, 8, stride=3)))
    np.testing.assert_array_equal(strided, read_xtc(path, stride=3))

    # routed through the generic iterator (the featurization engine's entry)
    via_traj = np.concatenate(list(iter_frame_chunks(path, 16)))
    np.testing.assert_array_equal(via_traj, full)


def test_colvars_memory_cache_equals_file_parse(tmp_path):
    """Same-run reads of files we wrote come from the memory cache with
    values IDENTICAL to a cold file parse (quantized at write); external
    modification invalidates the entry."""
    from deep_cartograph_tpu.io import colvars as cv

    rng = np.random.default_rng(7)
    data = np.column_stack(
        [np.arange(500, dtype=np.float32),
         rng.standard_normal((500, 40)).astype(np.float32)]
    )
    names = ["time"] + [f"f{i}" for i in range(40)]
    path = str(tmp_path / "colvars.dat")

    cv.clear_memory_cache()
    cv.write_colvars(path, data, names, fmt="%.6f")
    assert cv._cache_get(path) is not None  # populated at write

    cached = cv._load_matrix(path)
    cv.clear_memory_cache()
    parsed = cv._load_matrix(path)  # cold parse of the real file
    np.testing.assert_array_equal(cached, parsed)

    # re-populate, then modify the file externally -> cache must invalidate
    cv.write_colvars(path, data, names, fmt="%.6f")
    with open(path, "a") as fh:
        fh.write(" ".join(["1.0"] * 41) + "\n")
    fresh = cv._load_matrix(path)
    assert fresh.shape[0] == 501  # saw the appended row, not the cache
    cv.clear_memory_cache()


def test_iter_xtc_chunks_prefetch_abandonment_joins_worker(tmp_path):
    """Abandoning the XTC chunk iterator mid-stream retires the background
    decode thread (no leaked worker blocked on the queue)."""
    import threading

    from deep_cartograph_tpu.io.xtc import iter_xtc_chunks_prefetch, write_xtc

    rng = np.random.default_rng(6)
    coords = (rng.standard_normal((64, 24, 3)) * 4).astype(np.float32)
    path = str(tmp_path / "abandon.xtc")
    write_xtc(path, coords)

    before = set(threading.enumerate())
    it = iter_xtc_chunks_prefetch(path, chunk=4, prefetch_depth=1)
    first = next(it)
    assert first.shape == (4, 24, 3)
    it.close()  # GeneratorExit mid-stream
    # the SPECIFIC worker thread(s) this iterator started must exit —
    # comparing global active_count() would both flake on unrelated
    # threads and miss a leak masked by an unrelated exit
    import time as _t

    for _ in range(50):
        new_threads = [
            t for t in threading.enumerate()
            if t not in before and t.is_alive()
        ]
        if not new_threads:
            break
        _t.sleep(0.1)
    assert not new_threads, new_threads


def test_count_trr_frames_header_walk(tmp_path):
    from deep_cartograph_tpu.io.traj import get_num_frames
    from deep_cartograph_tpu.io.trr import count_trr_frames, write_trr

    rng = np.random.default_rng(8)
    coords = (rng.standard_normal((17, 12, 3)) * 3).astype(np.float32)
    path = str(tmp_path / "count.trr")
    write_trr(path, coords)
    assert count_trr_frames(path) == 17
    assert get_num_frames(path) == 17


def test_trr_writes_gromacs_version_section(tmp_path, rng):
    """write_trr emits the GROMACS trn layout: magic, slen=13 (strlen+1),
    then the XDR string [len=12]['GMX_trn_file'] — the byte sequence
    GROMACS/MDAnalysis/VMD parse (round-trip tests alone can't prove the
    external contract)."""
    import struct

    coords = rng.standard_normal((2, 5, 3)).astype(np.float32)
    path = str(tmp_path / "fmt.trr")
    write_trr(path, coords)
    raw = open(path, "rb").read()
    magic, slen, xlen = struct.unpack_from(">3i", raw, 0)
    assert magic == 1993
    assert slen == 13  # strlen("GMX_trn_file") + 1
    assert xlen == 12
    assert raw[12:24] == b"GMX_trn_file"
    np.testing.assert_allclose(read_trr(path), coords, atol=1e-4)


def test_trr_rejects_negative_payload_sizes(tmp_path, rng):
    import struct

    from deep_cartograph_tpu.io.trr import TRRError, count_trr_frames

    coords = rng.standard_normal((2, 5, 3)).astype(np.float32)
    path = str(tmp_path / "bad.trr")
    write_trr(path, coords)
    raw = bytearray(open(path, "rb").read())
    # corrupt the second frame's x_size (header: magic+4+4+12 then 13 ints;
    # x_size is the 8th int) to a negative value
    frame_bytes = len(raw) // 2
    x_size_off = frame_bytes + 4 + 4 + 12 + 7 * 4
    struct.pack_into(">i", raw, x_size_off, -100)
    open(path, "wb").write(bytes(raw))
    import pytest as _pytest

    with _pytest.raises(TRRError):
        count_trr_frames(path)


def test_xtc_count_rejects_corrupt_header_instead_of_looping(tmp_path, rng):
    import struct

    from deep_cartograph_tpu.io.xtc import (
        XTCError,
        count_xtc_frames,
        write_xtc,
    )

    coords = rng.standard_normal((3, 12, 3)).astype(np.float32) * 5
    path = str(tmp_path / "bad.xtc")
    write_xtc(path, coords)
    raw = bytearray(open(path, "rb").read())
    # negative nbytes in the FIRST frame's compressed-size field
    lsize_off = 16 + 36
    struct.pack_into(">i", raw, lsize_off + 4 + 32, -172)
    open(path, "wb").write(bytes(raw))
    import pytest as _pytest

    with _pytest.raises(XTCError):
        count_xtc_frames(path)


def test_crd_box_autodetection(tmp_path, rng):
    """Boxed Amber mdcrd files (3 extra values per frame) parse without the
    box triples shifting subsequent frames."""
    from deep_cartograph_tpu.io.crd import read_crd

    n_atoms, n_frames = 11, 4
    coords = (rng.standard_normal((n_frames, n_atoms, 3)) * 4).astype(
        np.float32
    )
    path = str(tmp_path / "boxed.crd")
    with open(path, "w") as fh:
        fh.write("boxed mdcrd\n")
        for f in range(n_frames):
            flat = coords[f].reshape(-1)
            for i in range(0, len(flat), 10):
                fh.write(
                    "".join(f"{v:8.3f}" for v in flat[i : i + 10]) + "\n"
                )
            fh.write(f"{20.0:8.3f}{20.0:8.3f}{20.0:8.3f}\n")  # box record
    back = read_crd(path, n_atoms)
    assert back.shape == (n_frames, n_atoms, 3)
    np.testing.assert_allclose(back, coords, atol=1e-3)

    # unboxed file still parses identically
    path2 = str(tmp_path / "plain.crd")
    with open(path2, "w") as fh:
        fh.write("plain mdcrd\n")
        for f in range(n_frames):
            flat = coords[f].reshape(-1)
            for i in range(0, len(flat), 10):
                fh.write(
                    "".join(f"{v:8.3f}" for v in flat[i : i + 10]) + "\n"
                )
    np.testing.assert_allclose(
        read_crd(path2, n_atoms), coords, atol=1e-3
    )


def test_crd_box_autodetection_tiny_system(tmp_path, rng):
    """Boxed mdcrd with 2 atoms (one 6-value row per frame): the 3-value
    box line cannot be a coordinate row (the next frame opens with 6
    values), so the box must be detected — a regression in the ambiguous
    divide-count branch once parsed the box triples as coordinates and
    returned 6 garbage frames instead of 4."""
    from deep_cartograph_tpu.io.crd import read_crd

    n_atoms, n_frames = 2, 4  # plain=6 per frame, boxed=9; 36 divides both
    coords = (rng.standard_normal((n_frames, n_atoms, 3)) * 4).astype(
        np.float32
    )
    path = str(tmp_path / "tinybox.crd")
    with open(path, "w") as fh:
        fh.write("tiny boxed mdcrd\n")
        for f in range(n_frames):
            flat = coords[f].reshape(-1)
            fh.write("".join(f"{v:8.3f}" for v in flat) + "\n")
            fh.write(f"{20.0:8.3f}{20.0:8.3f}{20.0:8.3f}\n")
    back = read_crd(path, n_atoms)
    assert back.shape == (n_frames, n_atoms, 3)
    np.testing.assert_allclose(back, coords, atol=1e-3)

    # 1 atom (plain=3) stays genuinely ambiguous -> no box assumed, and a
    # plain 1-atom file must keep parsing as coordinates only.
    path3 = str(tmp_path / "one_atom.crd")
    one = coords[:, :1, :]
    with open(path3, "w") as fh:
        fh.write("one-atom mdcrd\n")
        for f in range(n_frames):
            fh.write(
                "".join(f"{v:8.3f}" for v in one[f].reshape(-1)) + "\n"
            )
    np.testing.assert_allclose(read_crd(path3, 1), one, atol=1e-3)


def test_two_letter_element_guessing_and_selection(tmp_path):
    """Standalone ion names map to their two-letter elements; ambiguous
    protein names (CA, HG...) stay single-letter; element selections match
    case-insensitively."""
    from deep_cartograph_tpu.io.topology import Topology, _guess_element

    assert _guess_element("CL") == "CL"
    assert _guess_element("NA") == "NA"
    assert _guess_element("CA") == "C"   # C-alpha, not calcium
    assert _guess_element("HG1") == "H"  # gamma hydrogen, not mercury
    assert _guess_element("1HB") == "H"

    pdb = tmp_path / "ions.pdb"
    pdb.write_text(
        "ATOM      1  CA  ALA A   1       0.000   0.000   0.000"
        "  1.00  0.00\n"
        "ATOM      2  CL  CLA A   2       1.000   0.000   0.000"
        "  1.00  0.00\n"
        "END\n"
    )
    top = Topology.from_pdb(str(pdb))
    assert list(top.select("element Cl")) == [1]
    assert list(top.select("element cl")) == [1]
    assert list(top.select("element C")) == [0]


def test_na_element_gated_on_residue(tmp_path):
    """Heme/porphyrin pyrrole nitrogens are conventionally named NA — only
    ion residues (NA/SOD/...) map a standalone NA atom to sodium."""
    from deep_cartograph_tpu.io.topology import Topology, _guess_element

    assert _guess_element("NA", "HEM") == "N"
    assert _guess_element("NA", "NA") == "NA"
    assert _guess_element("NA", "SOD") == "NA"
    assert _guess_element("NA", "NA+") == "NA"
    assert _guess_element("NA") == "NA"  # no residue context: keep ion guess

    pdb = tmp_path / "hem.pdb"
    pdb.write_text(
        "HETATM    1  NA  HEM A   1       0.000   0.000   0.000"
        "  1.00  0.00\n"
        "HETATM    2  NA   NA A   2       1.000   0.000   0.000"
        "  1.00  0.00\n"
        "END\n"
    )
    top = Topology.from_pdb(str(pdb))
    assert top.elements[0] == "N"
    assert top.elements[1] == "NA"


def test_crd_tiny_system_not_falsely_boxed(tmp_path):
    """n_atoms=1 plain mdcrd: each frame is one 3-value line, which the box
    heuristic must not mistake for a box record (ambiguous-divide branch)."""
    from deep_cartograph_tpu.io.crd import read_crd

    coords = np.arange(12, dtype=np.float32).reshape(4, 1, 3)
    path = str(tmp_path / "tiny.crd")
    with open(path, "w") as fh:
        fh.write("tiny mdcrd\n")
        for f in range(4):
            fh.write("".join(f"{v:8.3f}" for v in coords[f, 0]) + "\n")
    back = read_crd(path, 1)
    assert back.shape == (4, 1, 3)
    np.testing.assert_allclose(back, coords, atol=1e-3)


def test_trr_legacy_layout_without_slen_still_reads(tmp_path, rng):
    """Files written by pre-round-3 write_trr (no slen int before the XDR
    version string) remain readable via the legacy-layout fallback."""
    import struct

    coords = rng.standard_normal((2, 5, 3)).astype(np.float32)
    ref = str(tmp_path / "modern.trr")
    write_trr(ref, coords)
    raw = open(ref, "rb").read()
    frame_bytes = len(raw) // 2
    legacy = bytearray()
    for f in range(2):
        frame = raw[f * frame_bytes : (f + 1) * frame_bytes]
        legacy += frame[:4] + frame[8:]  # drop the slen int after magic
    path = str(tmp_path / "legacy.trr")
    open(path, "wb").write(bytes(legacy))
    magic, first_int = struct.unpack_from(">2i", legacy, 0)
    assert magic == 1993 and first_int == 12  # XDR strlen, not slen
    np.testing.assert_allclose(read_trr(path), coords, atol=1e-4)


@pytest.mark.parametrize("cached", [True, False])
def test_colvars_iter_features_chunks_matches_bulk(tmp_path, rng, cached):
    """The streaming chunk reader yields exactly the in-memory reader's
    matrix — across chunk sizes, row windows, strides, and column
    subsets, through both the same-run memory cache and a cold file
    parse (native slab parser / numpy fallback)."""
    from deep_cartograph_tpu.io.colvars import (
        clear_memory_cache,
        iter_features_chunks,
        read_features_matrix,
        write_colvars,
    )

    n, f = 137, 7
    cols = ["time"] + [f"dist-@CA_1-@CA_{i+2}" for i in range(f)]
    data = rng.standard_normal((n, f + 1)).astype(np.float32)
    path = str(tmp_path / "chunks.dat")
    write_colvars(path, data, cols)
    if not cached:
        clear_memory_cache()

    for kwargs in (
        {},
        {"start": 10, "stop": 100, "stride": 3},
        {"stride": 2},
        {"feature_names": [cols[3], cols[1]]},
        {"start": 5, "stride": 4,
         "feature_names": [cols[2], cols[5], cols[4]]},
    ):
        ref, _ = read_features_matrix(path, **kwargs)
        for chunk_rows in (1, 13, 50, 500):
            got = list(iter_features_chunks(path, chunk_rows, **kwargs))
            assert all(b.shape[0] <= chunk_rows for b in got)
            np.testing.assert_allclose(
                np.concatenate(got) if got else np.empty((0, ref.shape[1])),
                ref, atol=0, rtol=0,
            )


def test_streaming_htica_over_colvars_chunks(tmp_path, rng):
    """End-to-end recipe for colvars files too large for RAM: StreamingHTICA
    fed by io.colvars.iter_features_chunks matches the in-memory HTICA
    solution on the same data."""
    from deep_cartograph_tpu.cv.htica_stream import StreamingHTICA
    from deep_cartograph_tpu.io.colvars import (
        clear_memory_cache,
        iter_features_chunks,
        write_colvars,
    )

    n, f = 400, 16
    data = rng.standard_normal((n, f)).astype(np.float32)
    data = (np.cumsum(data, axis=0) / 10 + data).astype(np.float32)
    cols = [f"dist-@CA_1-@CA_{i+2}" for i in range(f)]
    path = str(tmp_path / "wide.dat")
    write_colvars(path, data, cols, fmt="%.6f")
    clear_memory_cache()  # force the file-parse path

    sh = StreamingHTICA(
        n_features=f, num_subspaces=4, subspaces_dimension=2,
        cv_dimension=2, lag_time=5, reg=1e-6,
    )
    sh.fit(lambda: iter_features_chunks(path, 64))

    dense = StreamingHTICA(
        n_features=f, num_subspaces=4, subspaces_dimension=2,
        cv_dimension=2, lag_time=5, reg=1e-6,
    )
    quant = np.round(data.astype(np.float64), 6).astype(np.float32)
    dense.fit(lambda: iter([quant]))

    np.testing.assert_allclose(sh.eigenvalues_, dense.eigenvalues_, atol=1e-4)
    pa = np.abs(quant @ dense.weights)
    pb = np.abs(quant @ sh.weights)
    np.testing.assert_allclose(pb, pa, atol=1e-3)


def test_colvars_iter_features_chunks_validation(tmp_path, rng):
    """Invalid arguments fail identically on the cache-hit and cold paths
    (no cache-state-dependent behavior): chunk_rows/stride must be >= 1,
    negative start/stop are rejected (a streaming reader never knows the
    total row count, so from-the-end indexing cannot be honored)."""
    from deep_cartograph_tpu.io.colvars import (
        clear_memory_cache,
        iter_features_chunks,
        write_colvars,
    )

    cols = ["time", "dist-@CA_1-@CA_2"]
    data = rng.standard_normal((30, 2)).astype(np.float32)
    path = str(tmp_path / "val.dat")
    write_colvars(path, data, cols)

    for cold in (False, True):
        if cold:
            clear_memory_cache()
        for bad in (
            {"chunk_rows": 0},
            {"chunk_rows": -3},
            {"stride": 0},
            {"stride": -1},
            {"start": -10},
            {"stop": -5},
        ):
            kwargs = {"chunk_rows": 4, **bad}
            rows = kwargs.pop("chunk_rows")
            with pytest.raises(ValueError):
                next(iter_features_chunks(path, rows, **kwargs))
