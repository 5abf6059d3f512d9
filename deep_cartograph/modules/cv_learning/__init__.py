from deep_cartograph_tpu.cv import cv_calculators_map  # noqa: F401
from deep_cartograph_tpu.cv.base import CVCalculator  # noqa: F401
from deep_cartograph_tpu.cv.deep import (  # noqa: F401
    AECalculator,
    DeepTICACalculator,
    NonLinear,
    VAECalculator,
)
from deep_cartograph_tpu.cv.linear import (  # noqa: F401
    HTICACalculator,
    LinearCalculator,
    PCACalculator,
    TICACalculator,
)
from deep_cartograph_tpu.cv.umap_cv import UMAP  # noqa: F401
