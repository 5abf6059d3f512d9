from deep_cartograph_tpu.tools.traj_augmentation import *  # noqa: F401,F403
from deep_cartograph_tpu.tools.traj_augmentation import traj_augmentation  # noqa: F401
