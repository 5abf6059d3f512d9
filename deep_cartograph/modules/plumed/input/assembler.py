"""Drop-in re-exports for reference modules/plumed/input/assembler.py."""
from deep_cartograph_tpu.plumed.assembler import (  # noqa: F401
    Assembler,
    CollectiveVariableAssembler,
    EnhancedSamplingAssembler,
)
