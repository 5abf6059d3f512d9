from deep_cartograph_tpu.fes.kde import compute_fes, plot_fes
