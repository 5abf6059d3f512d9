from deep_cartograph_tpu.cv.base import (
    CVCalculator,
    cv_components_map,
    cv_names_map,
)
from deep_cartograph_tpu.cv.linear import (
    HTICACalculator,
    LinearCalculator,
    PCACalculator,
    TICACalculator,
)
from deep_cartograph_tpu.cv.deep import (
    AECalculator,
    DeepTICACalculator,
    NonLinear,
    VAECalculator,
)
from deep_cartograph_tpu.cv.umap_cv import UMAP

# Registry (cf. reference cv_calculator.py:2952-2960)
cv_calculators_map = {
    "pca": PCACalculator,
    "ae": AECalculator,
    "tica": TICACalculator,
    "htica": HTICACalculator,
    "deep_tica": DeepTICACalculator,
    "vae": VAECalculator,
    "umap": UMAP,
}
