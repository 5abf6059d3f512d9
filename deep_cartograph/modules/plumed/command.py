from deep_cartograph_tpu.plumed.command import *  # noqa: F401,F403
