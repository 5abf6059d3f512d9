from deep_cartograph_tpu.utils.common import *  # noqa: F401,F403
