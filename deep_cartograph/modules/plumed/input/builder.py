"""Drop-in re-exports for reference modules/plumed/input/builder.py."""
from deep_cartograph_tpu.plumed.builder import (  # noqa: F401
    ComputeCVBuilder,
    ComputeEnhancedSamplingBuilder,
    ComputeFeaturesBuilder,
)
