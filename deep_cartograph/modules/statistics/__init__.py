from deep_cartograph_tpu.cluster.clustering import (  # noqa: F401
    assign_nearest_neighbor,
    cluster_data,
    find_centroids,
    optimize_clustering,
)
from deep_cartograph_tpu.stats.descriptors import (  # noqa: F401
    difference_filter,
    min_value_filter,
    shannon_entropy,
    standard_deviation,
)
