"""Drop-in re-exports for reference modules/plumed/utils.py:16-114."""
from deep_cartograph_tpu.plumed.cli import get_traj_flag  # noqa: F401
from deep_cartograph_tpu.plumed.cli import sanitize_cryst1_record


def sanitize_CRYST1_record(pdb_path, output_folder):
    """Reference-named wrapper (modules/plumed/utils.py:62-114): strip a
    dummy CRYST1 record, writing the sanitized PDB under output_folder."""
    return sanitize_cryst1_record(pdb_path, output_folder)
