from deep_cartograph_tpu.parallel.mesh import (
    FRAME_AXIS,
    frame_sharding,
    get_mesh,
    init_distributed,
    pad_to_multiple,
    replicated,
)
from deep_cartograph_tpu.parallel.sharding import (
    lag_pairs_with_halo,
    sharded_covariances,
    sharded_feature_matrix_stats,
)
