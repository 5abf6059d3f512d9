from deep_cartograph_tpu.plumed.builder import *  # noqa: F401,F403
