from .builder import *  # noqa: F401,F403
from .assembler import *  # noqa: F401,F403
from .assembler import (  # noqa: F401
    Assembler,
    CollectiveVariableAssembler,
    EnhancedSamplingAssembler,
)
from .builder import (  # noqa: F401
    ComputeCVBuilder,
    ComputeEnhancedSamplingBuilder,
    ComputeFeaturesBuilder,
)
