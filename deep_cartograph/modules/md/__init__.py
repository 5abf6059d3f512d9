from deep_cartograph_tpu.md import *  # noqa: F401,F403
