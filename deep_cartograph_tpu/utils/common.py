"""Shared host-side utilities: files, zips, configuration, lists.

Functional parity with the reference toolkit's common module
(deep_cartograph/modules/common/common.py:20-666), re-implemented for the
TPU-native framework. These are host-side helpers (no device code).
"""

from __future__ import annotations

import logging
import math
import os
import shutil
import sys
import zipfile
from pathlib import Path, PurePath
from typing import Any, Dict, List, Optional, Tuple, Type, Union

import numpy as np
import yaml

logger = logging.getLogger(__name__)


def package_is_installed(*package_names: str) -> bool:
    """True if every named package is importable (cf. reference common.py:20-41)."""
    import importlib.util

    for package in package_names:
        if importlib.util.find_spec(package) is None:
            logger.debug("Package %s is not installed", package)
            return False
    return True


def files_exist(*file_paths: str, verbose: bool = True) -> bool:
    """True if all paths are existing files (cf. reference common.py:43-70)."""
    all_exist = True
    for path in file_paths:
        this_exists = os.path.isfile(path)
        all_exist = all_exist and this_exists
        if not this_exists and verbose:
            logger.error("File not found %s", path)
    return all_exist


def zip_files(output_zip_path: str, *paths_to_compress: str) -> None:
    """Zip files and/or directories preserving structure (cf. reference common.py:72-124)."""
    if not paths_to_compress:
        logger.warning("No input paths were provided to compress.")
        return
    with zipfile.ZipFile(output_zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for path in paths_to_compress:
            if not os.path.exists(path):
                logger.warning("Skipped: path '%s' does not exist.", path)
                continue
            if os.path.isfile(path):
                zf.write(path, arcname=os.path.basename(path))
            elif os.path.isdir(path):
                for root, _, files in os.walk(path):
                    for f in files:
                        full = os.path.join(root, f)
                        arc = os.path.relpath(full, os.path.dirname(path))
                        zf.write(full, arcname=arc)


def unzip_files(zip_path: str, output_folder: str) -> None:
    """Extract a zip archive (cf. reference common.py:126-155)."""
    if not os.path.isfile(zip_path):
        logger.error("ZIP file '%s' does not exist.", zip_path)
        return
    os.makedirs(output_folder, exist_ok=True)
    with zipfile.ZipFile(zip_path, "r") as zf:
        zf.extractall(output_folder)


def remove_files(*file_paths: str) -> None:
    """Safely delete files that exist (cf. reference common.py:157-167)."""
    for p in file_paths:
        if os.path.isfile(p):
            os.remove(p)


def remove_dirs(*dir_paths: str) -> None:
    for p in dir_paths:
        if os.path.isdir(p):
            shutil.rmtree(p)


# ---------------------------------------------------------------------------
# Configuration handling
# ---------------------------------------------------------------------------

def read_configuration(configuration_path: str) -> Dict[str, Any]:
    """Load a YAML configuration file (cf. reference common.py:170-193)."""
    if not files_exist(configuration_path):
        logger.error("Configuration file %s not found", configuration_path)
        sys.exit(1)
    with open(configuration_path) as fh:
        return yaml.safe_load(fh)


def validate_configuration(
    configuration: Dict[str, Any],
    schema: Type,
    output_folder: Optional[str],
) -> Dict[str, Any]:
    """Validate a config dict against a pydantic schema and dump the provenance
    record to ``output_folder/configuration.yml`` (cf. reference common.py:195-232)."""
    from pydantic import ValidationError

    try:
        validated = schema(**configuration).model_dump()
    except ValidationError as exc:
        logger.error("Configuration is not valid: %s", exc)
        sys.exit(1)
    if output_folder is not None:
        os.makedirs(output_folder, exist_ok=True)
        with open(os.path.join(output_folder, "configuration.yml"), "w") as fh:
            yaml.dump(validated, fh)
    return validated


def merge_configurations(common_config: Dict, specific_config: Optional[Dict]) -> Dict:
    """Recursive merge; specific values override common (cf. reference common.py:234-259)."""
    merged = dict(common_config)
    if specific_config:
        for key, value in specific_config.items():
            if key in merged and isinstance(merged[key], dict) and isinstance(value, dict):
                merged[key] = merge_configurations(merged[key], value)
            else:
                merged[key] = value
    return merged


# ---------------------------------------------------------------------------
# Feature lists
# ---------------------------------------------------------------------------

def read_features_list(features_path: Optional[str]) -> Optional[List[str]]:
    """Load a newline-separated feature list (cf. reference common.py:263-291)."""
    if features_path is None:
        return None
    with open(features_path) as fh:
        return [line.strip() for line in fh if line.strip()]


def save_list(items: List[str], path: str) -> None:
    """Write one item per line (cf. reference common.py:453-471)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as fh:
        for item in items:
            fh.write(f"{item}\n")


def read_list(path: str) -> List[str]:
    with open(path) as fh:
        return fh.readlines()


# ---------------------------------------------------------------------------
# Input discovery and pairing (trajectory <-> topology rules)
# ---------------------------------------------------------------------------

def find_files(paths: Union[List[str], str]) -> List[str]:
    """Expand file/folder paths to a sorted list of files (cf. reference common.py:295-345)."""
    if isinstance(paths, str):
        paths = [paths]
    file_paths: List[str] = []
    for path in paths:
        if not os.path.exists(path):
            logger.error("Path not found: %s", path)
            sys.exit(1)
        if os.path.isdir(path):
            # EXTEND, don't replace: the reference reassigns here
            # (common.py:330), silently dropping all earlier arguments
            # whenever a directory appears in the list.
            file_paths.extend(
                sorted(
                    os.path.join(path, f)
                    for f in os.listdir(path)
                    if os.path.isfile(os.path.join(path, f))
                )
            )
        elif os.path.isfile(path):
            file_paths.append(path)
        else:
            logger.error("Path should be a file or a folder: %s", paths)
            sys.exit(1)
    # Folder listings are sorted above for determinism, but the CALLER'S
    # argument order is preserved: tools pair these against
    # trajectory_names/topologies positionally (a global re-sort, as the
    # reference does, silently mismatches those pairings when e.g. the
    # pipeline appends augmented trajectories from the output folder).
    return [f for f in file_paths if not Path(f).name.startswith(".")]


def check_data(
    trajectory_data: Optional[Union[List[str], str]],
    topology_data: Optional[Union[List[str], str]],
) -> Tuple[List[str], List[str]]:
    """Pair trajectories with topologies under the reference's rules
    (single topology broadcast; name matching for folders; cf. common.py:347-410)."""
    traj_files = find_files(trajectory_data) if trajectory_data is not None else []
    top_files = find_files(topology_data) if topology_data is not None else []

    if len(top_files) > 1:
        for traj_f, top_f in zip(traj_files, top_files):
            if Path(traj_f).stem != Path(top_f).stem:
                logger.error(
                    "Trajectory file has no corresponding topology with the same name: %s",
                    Path(traj_f).stem,
                )
                sys.exit(1)
    if len(top_files) == 1 and len(traj_files) > 1:
        top_files = top_files * len(traj_files)
    if len(traj_files) != len(top_files):
        logger.error(
            "Number of topology files differs from trajectory files (%d vs %d).",
            len(top_files),
            len(traj_files),
        )
        sys.exit(1)
    return traj_files, top_files


def get_unique_path(path: str) -> str:
    """Append a numeric suffix until the path does not exist
    (cf. common.py:576-642).

    An existing EMPTY directory is returned as-is: the CLI pre-creates the
    output folder for its log file before the pipeline runs; uniquifying
    again (as the reference does, deep_carto.py:149 after :544) would
    strand the log/config in one folder and the outputs in another — and
    break -restart, which looks in the original folder.
    """
    pure = PurePath(path)
    if not os.path.exists(path):
        return path
    if os.path.isdir(path):
        try:
            entries = [
                e for e in os.listdir(path)
                if e != "deep_cartograph.log"
            ]
        except OSError:
            entries = ["?"]
        if not entries:
            return path
    parent = pure.parent
    if os.path.isfile(path):
        stem, suffix = pure.stem, pure.suffix
        i = 1
        while os.path.exists(path):
            path = os.path.join(parent, f"{stem}_{i}{suffix}")
            i += 1
        return path
    name = pure.name
    i = 1
    while os.path.exists(path):
        path = os.path.join(parent, f"{name}_{i}")
        i += 1
    return path


def closest_power_of_two(n: int) -> int:
    """Largest power of two strictly below n (cf. reference common.py:645-666)."""
    p = 2 ** math.floor(math.log2(n))
    if p == n:
        p //= 2
    return p


def save_data(
    y_data: Dict[str, np.ndarray],
    x_data: Dict[str, np.ndarray],
    y_label: str,
    x_label: str,
    folder_path: str,
) -> None:
    """Dump paired x/y arrays per key to CSV (cf. reference common.py:473-504)."""
    os.makedirs(folder_path, exist_ok=True)
    for key, y in y_data.items():
        x = x_data.get(key)
        if x is None:
            raise ValueError(f"No x values provided for {key}")
        np.savetxt(
            os.path.join(folder_path, f"{key}.csv"),
            np.column_stack((np.asarray(x), np.asarray(y))),
            delimiter=",",
            header=f"{x_label},{y_label}",
            comments="",
        )


def write_as_csv(dataframe, path: str) -> None:
    """Append a DataFrame to a PLUMED-format file, continuing the time axis
    (ns -> ps conversion; cf. reference common.py:506-551)."""
    dataframe = dataframe.copy()
    dataframe["time"] = dataframe["time"] * 1000
    if not os.path.isfile(path):
        header_line = "#! FIELDS " + " ".join(dataframe.columns)
        with open(path, "w") as fh:
            fh.write(header_line + "\n")
    else:
        with open(path) as fh:
            last_line = fh.readlines()[-1]
        last_time = float(last_line.split()[0])
        # drop the repeated initial sample and continue the time axis
        dataframe = dataframe.drop(dataframe.index[0])
        dataframe["time"] = dataframe["time"] + last_time
    dataframe.to_csv(
        path, mode="a", header=False, index=False, sep=" ", float_format="%.6f"
    )


def create_dataset_from_dataframe(df, filter_args: Optional[dict] = None):
    """Feature matrix (numpy) from a colvars DataFrame, dropping
    labels/time/bias/walker columns (array-returning analog of the
    reference's torch DictDataset helper, common.py:413-451)."""
    data = df.filter(**filter_args) if filter_args is not None else df.copy()
    data = data.filter(regex="^(?!.*labels)^(?!.*time)^(?!.*bias)^(?!.*walker)")
    return data.to_numpy(dtype=np.float32)
