from deep_cartograph_tpu.tools.align_trajectories import *  # noqa: F401,F403
from deep_cartograph_tpu.tools.align_trajectories import align_trajectories  # noqa: F401
