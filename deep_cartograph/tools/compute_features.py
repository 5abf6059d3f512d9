from deep_cartograph_tpu.tools.compute_features import *  # noqa: F401,F403
from deep_cartograph_tpu.tools.compute_features import compute_features  # noqa: F401
