from deep_cartograph_tpu.plumed.assembler import *  # noqa: F401,F403
