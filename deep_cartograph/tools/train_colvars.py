from deep_cartograph_tpu.tools.train_colvars import *  # noqa: F401,F403
from deep_cartograph_tpu.tools.train_colvars import train_colvars  # noqa: F401
