from deep_cartograph_tpu.config.schemas import *  # noqa: F401,F403
from deep_cartograph_tpu.config.schemas import ProjFigures

# Reference name (yaml_schemas/traj_projection.py:76).
Figures = ProjFigures
