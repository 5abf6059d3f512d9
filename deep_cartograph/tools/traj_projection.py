from deep_cartograph_tpu.tools.traj_projection import *  # noqa: F401,F403
from deep_cartograph_tpu.tools.traj_projection import traj_projection  # noqa: F401
