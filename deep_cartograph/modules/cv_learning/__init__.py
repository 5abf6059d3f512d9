from deep_cartograph_tpu.cv import cv_calculators_map  # noqa: F401
from deep_cartograph_tpu.cv.base import CVCalculator  # noqa: F401
