"""PLUMED COLVARS text-file I/O.

API-compatible with the reference's colvars module
(deep_cartograph/modules/plumed/colvars.py:17-473): same header convention
("#! FIELDS ..."), same ps->ns time conversion on read, same
labels/time/bias/walker column filtering, same cross-topology feature
translation hooks. Parsing is a single vectorized numpy pass (no per-feature
file re-reads — see features/filter.py for the vectorized filter built on
this).
"""

from __future__ import annotations

import logging
import os
import re
import sys
from typing import Dict, List, Optional, Union

import numpy as np
import pandas as pd

logger = logging.getLogger(__name__)

# Regex used by the reference to drop non-feature columns
# (cf. reference colvars.py:93, 407).
NON_FEATURE_REGEX = "^(?!.*labels)^(?!.*time)^(?!.*bias)^(?!.*walker)"

# ---------------------------------------------------------------------------
# Same-run memory cache: the pipeline writes colvars text (the reference's
# inter-step contract) and the very next steps read those files back — at
# production scale that text round trip costs more than the device compute
# (measured: 37 s write + 14 s parse per read for 100k x 1171 on one core).
# write_colvars caches the matrix QUANTIZED to the written precision, so a
# cached read equals a file read; entries are validated against the file's
# (mtime_ns, size, inode, tail-bytes fingerprint) — the fingerprint catches
# same-size rewrites by external tools within a coarse-mtime window — and
# evicted LRU past the byte cap. Restartability is untouched: the files are
# still written, and a fresh process parses them.
# Disable with DEEP_CARTO_COLVARS_CACHE_BYTES=0.
# ---------------------------------------------------------------------------
from collections import OrderedDict  # noqa: E402

_MEM_CACHE: "OrderedDict[str, tuple]" = OrderedDict()
_MEM_CACHE_CAP_BYTES = int(
    os.environ.get("DEEP_CARTO_COLVARS_CACHE_BYTES", 2 * 2**30)
)


def _tail_fingerprint(path: str, size: int) -> bytes:
    """Last <=64 bytes of the file — a cheap content check that catches
    same-size rewrites landing within the filesystem's mtime granularity."""
    with open(path, "rb") as fh:
        if size > 64:
            fh.seek(-64, os.SEEK_END)
        return fh.read(64)


def _cache_put(path: str, names: List[str], matrix: np.ndarray) -> None:
    if _MEM_CACHE_CAP_BYTES <= 0:
        return
    key = os.path.abspath(path)
    try:
        stat = os.stat(key)
        tail = _tail_fingerprint(key, stat.st_size)
    except OSError:
        return
    matrix = np.ascontiguousarray(matrix, np.float32)
    if matrix.nbytes > _MEM_CACHE_CAP_BYTES:
        return
    _MEM_CACHE[key] = (
        (stat.st_mtime_ns, stat.st_size, stat.st_ino, tail),
        list(names),
        matrix,
    )
    _MEM_CACHE.move_to_end(key)
    total = sum(v[2].nbytes for v in _MEM_CACHE.values())
    while total > _MEM_CACHE_CAP_BYTES and len(_MEM_CACHE) > 1:
        _, evicted = _MEM_CACHE.popitem(last=False)
        total -= evicted[2].nbytes


def _cache_get(path: str):
    key = os.path.abspath(path)
    hit = _MEM_CACHE.get(key)
    if hit is None:
        return None
    try:
        stat = os.stat(key)
        tail = _tail_fingerprint(key, stat.st_size)
    except OSError:
        _MEM_CACHE.pop(key, None)
        return None
    if (stat.st_mtime_ns, stat.st_size, stat.st_ino, tail) != hit[0]:
        _MEM_CACHE.pop(key, None)
        return None
    _MEM_CACHE.move_to_end(key)
    return hit[1], hit[2]


def clear_memory_cache() -> None:
    _MEM_CACHE.clear()


def read_column_names(colvars_path: str, features_only: bool = False) -> List[str]:
    """Column names from the '#! FIELDS' header (cf. reference colvars.py:62-98)."""
    hit = _cache_get(colvars_path)
    if hit is not None:
        names = list(hit[0])
    else:
        with open(colvars_path) as fh:
            first_line = fh.readline()
        parts = first_line.split()
        names = parts[2:]
    if features_only:
        names = [n for n in names if re.search(NON_FEATURE_REGEX, n)]
    return names


def _load_matrix(colvars_path: str) -> np.ndarray:
    """Bulk-parse the numeric body of a colvars file as float32.

    Uses the OpenMP C++ parser (native/colvars_io.cpp) when available —
    ~10x numpy.loadtxt on production-size files — with numpy fallback.
    Files written by this process in the same run are served from the
    memory cache (values identical to a file parse — quantized at write).
    """
    hit = _cache_get(colvars_path)
    if hit is not None:
        # copy: callers may hand the matrix to pandas or mutate slices
        return hit[1].copy()

    n_cols = len(read_column_names(colvars_path))
    if n_cols == 0:
        return np.loadtxt(
            colvars_path, comments="#", dtype=np.float32, ndmin=2
        )
    with open(colvars_path, "rb") as fh:
        buf = fh.read()
    return _parse_body(buf, n_cols, origin=colvars_path)


def read_colvars(colvars_path: str, **kwargs) -> pd.DataFrame:
    """Whole-file read with ps->ns time conversion (cf. reference colvars.py:17-60)."""
    names = read_column_names(colvars_path)
    data = _load_matrix(colvars_path)
    df = pd.DataFrame(data, columns=names)
    if "time" in df.columns:
        df["time"] = df["time"] * 1000 / 1000000
    return df


def read_features_matrix(
    colvars_path: str,
    feature_names: Optional[List[str]] = None,
    start: int = 0,
    stop: Optional[int] = None,
    stride: int = 1,
) -> tuple[np.ndarray, List[str]]:
    """Vectorized feature-matrix read: returns ((frames, features) float32, names).

    This is the TPU-path entry point — one parse, all features, ready for a
    single device upload (removes the reference's per-feature re-read loop,
    filter.py:213-228).
    """
    all_names = read_column_names(colvars_path)
    data = _load_matrix(colvars_path)[start:stop:stride]
    keep, names = _resolve_feature_columns(
        all_names, feature_names, colvars_path
    )
    return data[:, keep], names


def _resolve_feature_columns(
    all_names: List[str],
    feature_names: Optional[List[str]],
    colvars_path: str,
) -> tuple[List[int], List[str]]:
    """Column indices + names for a feature selection: the requested names
    in their requested order, or every non-label/time/bias/walker column."""
    if feature_names is None:
        keep = [
            i for i, n in enumerate(all_names)
            if re.search(NON_FEATURE_REGEX, n)
        ]
        names = [all_names[i] for i in keep]
    else:
        index = {n: i for i, n in enumerate(all_names)}
        missing = [n for n in feature_names if n not in index]
        if missing:
            raise ValueError(
                f"Features {missing} not found in colvars file {colvars_path}"
            )
        keep = [index[n] for n in feature_names]
        names = list(feature_names)
    return keep, names


def _parse_body(body: bytes, n_cols: int, origin: str = "<slab>") -> np.ndarray:
    """Parse a line-aligned byte slab of a colvars body to (rows, n_cols)
    float32 (native OpenMP parser when available, numpy fallback).
    Comment lines ('#'-prefixed) are skipped by both parsers."""
    import ctypes
    import io as _io

    from deep_cartograph_tpu.native.build import load_native

    lib = load_native()
    if lib is not None and hasattr(lib, "colvars_parse"):
        max_rows = body.count(b"\n") + 1
        out = np.empty((max_rows, n_cols), np.float32)
        rows = lib.colvars_parse(
            body,
            len(body),
            n_cols,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            max_rows,
        )
        if rows >= 0:
            return out[:rows]
        logger.warning(
            "Native colvars parse failed for %s; falling back to numpy.",
            origin,
        )
    return np.loadtxt(
        _io.BytesIO(body), comments="#", dtype=np.float32, ndmin=2
    )


def iter_features_chunks(
    colvars_path: str,
    chunk_rows: Optional[int] = None,
    feature_names: Optional[List[str]] = None,
    start: int = 0,
    stop: Optional[int] = None,
    stride: int = 1,
    nan_check: bool = False,
):
    """Stream the feature matrix of a colvars file as (<=chunk_rows, F)
    float32 blocks WITHOUT materializing the full matrix — the reader for
    feature sets too large for host RAM (pair it with
    cv.htica_stream.StreamingHTICA, whose block iterator contract this
    satisfies; see tests/test_htica_stream.py for the end-to-end recipe).

    The file is read in line-aligned byte slabs sized to ~chunk_rows rows;
    each slab is parsed by the same native/numpy path as read_features_matrix
    and sliced to the selected feature columns, so values are identical to
    the in-memory reader's. `start`/`stop`/`stride` follow
    read_features_matrix's row semantics (applied to the global row index),
    except that negative start/stop are rejected: the streaming reader
    never knows the total row count up front, so Python's from-the-end
    indexing cannot be honored.

    Yields (rows, F) arrays; the final block may be short. Returns without
    yielding for empty bodies. ``chunk_rows=None`` auto-sizes from the
    file's FULL column width (stream_chunk_rows). ``nan_check`` raises the
    in-memory loader's "Clean your data!" error on a NaN anywhere in the
    FULL-width parsed rows (not just the selected columns), matching
    create_dataframe_from_files' validation scope.
    """
    if chunk_rows is None:
        chunk_rows = stream_chunk_rows(colvars_path)
    if chunk_rows < 1:
        raise ValueError(f"chunk_rows must be >= 1, got {chunk_rows}")
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    if start < 0 or (stop is not None and stop < 0):
        raise ValueError(
            "negative start/stop are not supported by the streaming "
            f"reader (got start={start}, stop={stop}); use "
            "read_features_matrix for from-the-end indexing"
        )
    all_names = read_column_names(colvars_path)
    n_cols = len(all_names)
    if n_cols == 0:
        return
    keep, _ = _resolve_feature_columns(all_names, feature_names, colvars_path)
    keep_arr = np.asarray(keep, dtype=np.intp)

    hit = _cache_get(colvars_path)
    if hit is not None:
        if nan_check and np.isnan(hit[1]).any():
            raise ValueError(f"Clean your data! NaNs found in {colvars_path}")
        mat = hit[1][start:stop:stride]
        for s in range(0, mat.shape[0], chunk_rows):
            yield np.ascontiguousarray(
                mat[s : s + chunk_rows][:, keep_arr]
            )
        return
    # ~18 bytes per formatted float column is the upper end of PLUMED's
    # default %14.9f-ish formats; size slabs so one slab ~ chunk_rows rows.
    slab_bytes = max(chunk_rows * n_cols * 18, 1 << 20)
    row_idx = 0            # global data-row index (comment lines excluded)
    pending: List[np.ndarray] = []
    pending_rows = 0

    def _select(block: np.ndarray):
        nonlocal row_idx
        if nan_check and np.isnan(block).any():
            raise ValueError(f"Clean your data! NaNs found in {colvars_path}")
        lo = row_idx
        row_idx += block.shape[0]
        # global [start:stop:stride] applied to this block's row range
        first = max(start, lo)
        if stride > 1 and first > start:
            first = start + ((first - start + stride - 1) // stride) * stride
        hi = row_idx if stop is None else min(stop, row_idx)
        if first >= hi:
            return None
        rows = np.arange(first, hi, stride) - lo
        if rows.size == 0:
            return None
        return block[rows][:, keep_arr]

    with open(colvars_path, "rb") as fh:
        carry = b""
        while True:
            slab = fh.read(slab_bytes)
            if not slab:
                break
            slab = carry + slab
            cut = slab.rfind(b"\n")
            if cut < 0:
                carry = slab
                continue
            carry = slab[cut + 1 :]
            sel = _select(_parse_body(slab[: cut + 1], n_cols))
            if sel is not None and sel.shape[0]:
                pending.append(sel)
                pending_rows += sel.shape[0]
            while pending_rows >= chunk_rows:
                merged = np.concatenate(pending) if len(pending) > 1 \
                    else pending[0]
                yield np.ascontiguousarray(merged[:chunk_rows])
                rest = merged[chunk_rows:]
                pending = [rest] if rest.shape[0] else []
                pending_rows = rest.shape[0]
        if carry.strip():
            sel = _select(_parse_body(carry, n_cols))
            if sel is not None and sel.shape[0]:
                pending.append(sel)
                pending_rows += sel.shape[0]
    while pending_rows > 0:
        merged = np.concatenate(pending) if len(pending) > 1 else pending[0]
        yield np.ascontiguousarray(merged[:chunk_rows])
        rest = merged[chunk_rows:]
        pending = [rest] if rest.shape[0] else []
        pending_rows = rest.shape[0]


def read_features(
    colvars_paths: Union[List[str], str],
    ref_feature_names: List[str],
    topology_paths: Union[List[str], None] = None,
    reference_topology: Union[str, None] = None,
    stratified_samples: Union[List[int], None] = None,
) -> pd.DataFrame:
    """Read feature time series across files with cross-topology translation
    (cf. reference colvars.py:100-201)."""
    from deep_cartograph_tpu.features.translator import Translator

    if isinstance(colvars_paths, str):
        colvars_paths = [colvars_paths]
    if topology_paths:
        if not reference_topology:
            reference_topology = topology_paths[0]
        if len(colvars_paths) != len(topology_paths):
            logger.error("Number of topology files does not match colvars files.")
            sys.exit(1)

    blocks: List[np.ndarray] = []
    for ci, colvars_path in enumerate(colvars_paths):
        if not os.path.exists(colvars_path):
            logger.error("Colvars file not found: %s", colvars_path)
            sys.exit(1)
        if topology_paths:
            selected = Translator(
                reference_topology, topology_paths[ci], ref_feature_names
            ).run()
        else:
            selected = list(ref_feature_names)
        for fi, name in enumerate(selected):
            if name is None:
                logger.error(
                    "Feature %s not found in the reference topology.",
                    ref_feature_names[fi],
                )
                sys.exit(1)
        if stratified_samples is None:
            mat, _ = read_features_matrix(colvars_path, selected)
        else:
            mat, _ = read_features_matrix(colvars_path, selected)
            # stratified_samples indexes data rows starting at 1 in the
            # reference (header line counts as row 0) — normalize here.
            rows = [s - 1 for s in stratified_samples if 1 <= s <= mat.shape[0]]
            mat = mat[rows]
        blocks.append(mat)
    merged = np.concatenate(blocks, axis=0)
    return pd.DataFrame(merged, columns=ref_feature_names)


def check(colvars_path: str) -> None:
    """Fail-fast validation: exists, non-empty, no NaNs
    (cf. reference colvars.py:203-231)."""
    if not os.path.exists(colvars_path):
        logger.error("COLVARS file not found: %s", colvars_path)
        sys.exit(1)
    data = _load_matrix(colvars_path)
    if data.size == 0:
        logger.error("COLVARS file is empty: %s", colvars_path)
        sys.exit(1)
    if np.isnan(data).any():
        logger.error("COLVARS file contains NaN values: %s", colvars_path)
        sys.exit(1)


def estimate_matrix_bytes(
    colvars_paths: Union[List[str], str],
    n_features: int,
    start: int = 0,
    stop: Optional[int] = None,
    stride: int = 1,
) -> int:
    """Cheap fp32 feature-matrix size estimate from file sizes + a head
    sample (rows ~ bytes / avg data-line length), honoring an optional
    reading window. Only used to pick a loading strategy (in-memory vs
    streaming); not exact."""
    if isinstance(colvars_paths, str):
        colvars_paths = [colvars_paths]
    stride = max(stride, 1)
    total_rows = 0
    for p in colvars_paths:
        size = os.path.getsize(p)
        with open(p, "rb") as fh:
            head = fh.read(65536)
        lines = [
            ln for ln in head.split(b"\n")
            if ln and not ln.startswith(b"#")
        ]
        bpr = (
            sum(len(ln) + 1 for ln in lines) / len(lines)
            if lines else max(n_features, 1) * 12
        )
        rows = int(size / max(bpr, 1))
        rows = len(range(start, rows if stop is None else min(stop, rows),
                         stride)) if rows > start else 0
        total_rows += rows
    return total_rows * n_features * 4


def stream_chunk_rows(
    colvars_path: str, budget_bytes: int = 256 * 2**20
) -> int:
    """Rows per streamed block such that one full-width parsed slab stays
    within ~budget_bytes. Sizing MUST use the file's total column count —
    the slab parses ALL columns before any selection, so sizing by a
    narrower selection would blow the budget by n_cols/len(selection).
    DEEP_CARTO_STREAM_CHUNK_ROWS overrides."""
    env = int(os.environ.get("DEEP_CARTO_STREAM_CHUNK_ROWS", 0))
    if env > 0:
        return env
    n_cols = max(len(read_column_names(colvars_path)), 1)
    return max(budget_bytes // (4 * n_cols), 256)


def should_stream_colvars(
    colvars_paths: Union[List[str], str], mode="auto"
) -> bool:
    """Shared larger-than-RAM streaming trigger. Streams only PLUMED
    files. 'auto' streams when the estimated FULL-WIDTH fp32 matrix —
    what the in-memory reader materializes before any column selection —
    exceeds DEEP_CARTO_STREAM_BYTES (default 4 GiB; 0 disables auto).
    True/'on' forces (if eligible); False/'off' disables."""
    if isinstance(colvars_paths, str):
        colvars_paths = [colvars_paths]
    if mode in (False, "off", "false"):
        return False
    eligible = bool(colvars_paths) and all(
        is_plumed_file(p) for p in colvars_paths
    )
    if mode in (True, "on"):
        return eligible
    if not eligible:
        return False
    threshold = int(os.environ.get("DEEP_CARTO_STREAM_BYTES", 4 * 2**30))
    if threshold <= 0:
        return False
    total = sum(
        estimate_matrix_bytes([p], max(len(read_column_names(p)), 1))
        for p in colvars_paths
    )
    return total > threshold


def translation_is_identity(
    topology_paths: Optional[List[str]], reference_topology: Optional[str]
) -> bool:
    """True when per-file cross-topology feature translation would be a
    no-op: no topologies given, or every topology IS the reference topology
    (which defaults to the first topology when unset — cf.
    CVCalculator.load_training_data). The streaming readers select columns
    by untranslated feature name, so they are valid exactly in this case."""
    if not topology_paths:
        return True
    ref = reference_topology or topology_paths[0]
    try:
        r = os.path.realpath(ref)
        return all(os.path.realpath(p) == r for p in topology_paths)
    except OSError:
        return False


def is_plumed_file(file_path: str) -> bool:
    """True if file starts with '#! FIELDS' (cf. reference colvars.py:234-252)."""
    with open(file_path) as fh:
        first = fh.readline().split()
    return len(first) >= 2 and first[0] == "#!" and first[1] == "FIELDS"


def load_dataframe(
    file_paths: Union[List[str], str],
    start: int = 0,
    stop: Union[int, None] = None,
    stride: int = 1,
    **kwargs,
) -> pd.DataFrame:
    """Load PLUMED or plain CSV files into one DataFrame
    (cf. reference colvars.py:254-320)."""
    if isinstance(file_paths, str):
        file_paths = [file_paths]
    dfs = []
    for path in file_paths:
        df = read_colvars(path) if is_plumed_file(path) else pd.read_csv(path, **kwargs)
        dfs.append(df.iloc[start:stop:stride, :])
    out = pd.concat(dfs)
    out.reset_index(drop=True, inplace=True)
    return out


def create_dataframe_from_files(
    colvars_paths: Union[List[str], str],
    topology_paths: Optional[Union[List[str], str]] = None,
    reference_topology: Optional[str] = None,
    features_list: Optional[List[str]] = None,
    file_label: Optional[str] = None,
    **kwargs,
) -> pd.DataFrame:
    """Multi-file merge with translation + per-file labels
    (cf. reference colvars.py:322-473)."""
    from deep_cartograph_tpu.features.translator import Translator

    if isinstance(colvars_paths, str):
        colvars_paths = [colvars_paths]
    if isinstance(topology_paths, str):
        topology_paths = [topology_paths]
    if topology_paths:
        if len(colvars_paths) != len(topology_paths):
            raise TypeError(
                "topology_paths should be a list of the same length as colvars_paths."
            )
        if not reference_topology:
            reference_topology = topology_paths[0]

    all_dfs: List[pd.DataFrame] = []
    for fi, path in enumerate(colvars_paths):
        df = load_dataframe(path, **kwargs)
        if df.isna().any().any():
            raise ValueError(f"Clean your data! NaNs found in {path}")
        df = df.filter(regex=NON_FEATURE_REGEX)
        if topology_paths:
            feature_names = list(df.columns)
            translated = Translator(
                topology_paths[fi], reference_topology, feature_names
            ).run()
            mask = [t is not None for t in translated]
            new_names = [t for t in translated if t is not None]
            dropped = len(translated) - sum(mask)
            if dropped:
                logger.warning(
                    "%d features could not be translated from %s to %s and will be dropped.",
                    dropped,
                    topology_paths[fi],
                    reference_topology,
                )
            df = df.loc[:, mask]
            df.columns = new_names
        if features_list:
            missing = set(features_list) - set(df.columns)
            if missing:
                raise ValueError(f"Features {missing} not found in {path}.")
            df = df[features_list]
        if file_label:
            df[file_label] = fi
        all_dfs.append(df)

    if not all_dfs:
        logger.error("No dataframes to concatenate.")
        return pd.DataFrame()
    if not features_list:
        first_cols = all_dfs[0].columns
        for i, df_i in enumerate(all_dfs[1:], 1):
            if not df_i.columns.equals(first_cols):
                logger.error(
                    "Column names in %s do not match those in %s.",
                    colvars_paths[i],
                    colvars_paths[0],
                )
                sys.exit(1)
    out = pd.concat(all_dfs, ignore_index=True)
    if out.empty:
        logger.error("The resulting dataframe is empty.")
        sys.exit(1)
    return out


def write_colvars(
    path: str,
    data: np.ndarray,
    column_names: List[str],
    fmt: str = "%.4f",
) -> None:
    """Write a PLUMED-format colvars file ('#! FIELDS ...' header + rows).

    Uses the OpenMP C++ formatter when available (parallel row formatting),
    numpy.savetxt otherwise.
    """
    import ctypes
    import re as _re

    from deep_cartograph_tpu.native.build import load_native

    header = "#! FIELDS " + " ".join(column_names)
    data = np.ascontiguousarray(data, np.float32)
    lib = load_native()
    m = _re.fullmatch(r"%\.(\d+)f", fmt)
    if lib is not None and hasattr(lib, "colvars_format") and m and data.ndim == 2:
        decimals = int(m.group(1))
        rows, cols = data.shape
        # Size for the data's actual magnitude (plus slack): tokens are
        # sign + int-digits + '.' + decimals + separator. A NaN/Inf max
        # routes to the generous fallback budget.
        # min/max (no np.abs temporary: this path handles GB-scale
        # matrices); NaN propagates to the generous fallback budget.
        max_abs = max(
            abs(float(np.min(data, initial=0.0))),
            abs(float(np.max(data, initial=0.0))),
        )
        int_digits = (
            int(np.floor(np.log10(max_abs))) + 2
            if np.isfinite(max_abs) and max_abs >= 1.0
            else 2 if np.isfinite(max_abs) else 40
        )
        per_value = max(decimals + int_digits + 4, decimals + 16)
        capacity = rows * cols * per_value + 1024
        # np.empty: unlike ctypes.create_string_buffer this does NOT zero
        # the (gigabyte-scale) buffer, and memoryview slicing writes the
        # formatted bytes without an extra copy.
        out = np.empty(capacity, np.uint8)
        roundtrip = None
        if hasattr(lib, "colvars_format_rt") and _MEM_CACHE_CAP_BYTES > 0:
            # the formatter also returns, per value, the float32 a reader
            # will parse from the emitted token — exact by construction
            roundtrip = np.empty((rows, cols), np.float32)
            n = lib.colvars_format_rt(
                data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                rows,
                cols,
                decimals,
                out.ctypes.data_as(ctypes.c_char_p),
                capacity,
                roundtrip.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            )
        else:
            n = lib.colvars_format(
                data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                rows,
                cols,
                decimals,
                out.ctypes.data_as(ctypes.c_char_p),
                capacity,
            )
        if n >= 0:
            with open(path, "wb") as fh:
                fh.write((header + "\n").encode())
                fh.write(memoryview(out)[:n])
            if roundtrip is not None:
                _cache_put(path, column_names, roundtrip)
            # without the round-trip output the cache would only hold an
            # APPROXIMATION of the file's values (float64 np.round can
            # differ from printf by 1 ulp on rounding-boundary cases) —
            # skip caching rather than risk cached-run vs restarted-run
            # divergence; cold reads parse the file.
            return
    with open(path, "w") as fh:
        fh.write(header + "\n")
        np.savetxt(fh, np.asarray(data), fmt=fmt, delimiter=" ")
    # The same exactness contract applies here: np.round over float64 can
    # differ from printf/strtof by 1 ulp on rounding-boundary cases, so a
    # cached same-run read could diverge from a restarted run's file parse.
    # Skip caching; cold reads parse the file (exact by definition).
