from deep_cartograph_tpu.figures.plots import *  # noqa: F401,F403
from deep_cartograph_tpu.fes.kde import compute_fes, plot_fes  # noqa: F401
