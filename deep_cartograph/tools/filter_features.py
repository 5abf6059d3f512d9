from deep_cartograph_tpu.tools.filter_features import *  # noqa: F401,F403
from deep_cartograph_tpu.tools.filter_features import filter_features  # noqa: F401
