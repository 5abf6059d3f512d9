from deep_cartograph_tpu.tools.traj_cluster import *  # noqa: F401,F403
from deep_cartograph_tpu.tools.traj_cluster import traj_cluster  # noqa: F401
