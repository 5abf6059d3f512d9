from deep_cartograph_tpu.config.schemas import *  # noqa: F401,F403
