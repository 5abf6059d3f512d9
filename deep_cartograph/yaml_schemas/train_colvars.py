from deep_cartograph_tpu.config.schemas import *  # noqa: F401,F403
from deep_cartograph_tpu.config.schemas import TrainFigures

# Reference name (yaml_schemas/train_colvars.py:229): each tool file defines
# its own `Figures` model; ours are disambiguated package-wide.
Figures = TrainFigures
