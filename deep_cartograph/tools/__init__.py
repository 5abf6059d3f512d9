from deep_cartograph_tpu.tools import (  # noqa: F401
    align_trajectories,
    analyze_geometry,
    compute_features,
    filter_features,
    train_colvars,
    traj_augmentation,
    traj_cluster,
    traj_projection,
)

__all__ = [
    "analyze_geometry", "compute_features", "filter_features",
    "train_colvars", "traj_projection", "traj_cluster",
    "traj_augmentation", "align_trajectories",
]
