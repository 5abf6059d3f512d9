"""Drop-in `deep_cartograph.data` package.

The reference bundles binary example datasets here
(/root/reference/deep_cartograph/data: alanine_dipeptide,
calpha_transitions, muller_brown, peptide_ensemble, protein_1BM8). This
framework GENERATES equivalent synthetic datasets into this package
directory on first import (deep_cartograph_tpu.utils.demo_data), keeping
the same directory layout and naming so reference-style resolution —

    import importlib.resources as resources
    from deep_cartograph import data
    data_folder = resources.files(data)
    traj = f"{data_folder}/peptide_ensemble/input/peptide1/peptide1.xtc"

— keeps working. Call `regenerate()` to rebuild from scratch.
"""

import logging as _logging
import os as _os

from deep_cartograph_tpu.utils.demo_data import (  # noqa: F401
    DATASETS,
    materialize,
)

_ROOT = _os.environ.get(
    "DEEP_CARTO_DATA_DIR", _os.path.dirname(_os.path.abspath(__file__))
)


def regenerate() -> None:
    """Force-regenerate every demo dataset in place."""
    materialize(_ROOT, force=True)


try:
    materialize(_ROOT)
except OSError as _exc:  # read-only install (site-packages, container layer)
    _logging.getLogger(__name__).warning(
        "Could not generate the demo datasets under %s (%s). Set "
        "DEEP_CARTO_DATA_DIR to a writable directory and re-import, or call "
        "deep_cartograph.data.materialize(<dir>).",
        _ROOT,
        _exc,
    )
