from deep_cartograph_tpu.cluster.clustering import (  # noqa: F401
    assign_nearest_neighbor,
    cluster_data,
    find_centroids,
    hdbscan_clustering,
    hierarchical_clustering,
    kmeans_clustering,
    optimize_clustering,
)
from deep_cartograph_tpu.stats.descriptors import (  # noqa: F401
    difference_filter,
    min_value_filter,
    shannon_entropy,
    standard_deviation,
)


def dip_test(features_df):
    """Per-feature Hartigan dip p-values (reference statistics.py:595-635
    signature: DataFrame in, list of p-values out)."""
    import numpy as np

    from deep_cartograph_tpu.stats.descriptors import dip_pvalues

    return [float(p) for p in dip_pvalues(np.asarray(features_df, float))]
