from deep_cartograph_tpu.config.schemas import *  # noqa: F401,F403
from deep_cartograph_tpu.config.schemas import ClusterFigures

# Reference name (yaml_schemas/traj_cluster.py:4).
Figures = ClusterFigures
