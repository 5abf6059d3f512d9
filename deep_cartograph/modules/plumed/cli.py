"""Drop-in re-export of the PLUMED driver invocation layer
(reference modules/plumed/cli.py:19-163)."""
from deep_cartograph_tpu.plumed.cli import (  # noqa: F401
    get_driver_command,
    run_plumed,
)
