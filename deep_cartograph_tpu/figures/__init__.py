from deep_cartograph_tpu.figures.plots import (
    generate_cmap,
    get_ranges,
    clusters_scatter_plot,
    create_cv_plot,
    generate_colors,
    gradient_scatter_plot,
    plot_clusters_size,
    plot_data,
    plot_metrics,
    plot_sensitivity_results,
)
