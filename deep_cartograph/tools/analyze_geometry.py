from deep_cartograph_tpu.tools.analyze_geometry import *  # noqa: F401,F403
from deep_cartograph_tpu.tools.analyze_geometry import analyze_geometry  # noqa: F401
