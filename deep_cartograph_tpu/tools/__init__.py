from deep_cartograph_tpu.tools.align_trajectories import align_trajectories
from deep_cartograph_tpu.tools.analyze_geometry import analyze_geometry
from deep_cartograph_tpu.tools.compute_features import compute_features
from deep_cartograph_tpu.tools.filter_features import filter_features
from deep_cartograph_tpu.tools.train_colvars import TrainColvarsWorkflow, train_colvars
from deep_cartograph_tpu.tools.traj_augmentation import traj_augmentation
from deep_cartograph_tpu.tools.traj_cluster import TrajClusterWorkflow, traj_cluster
from deep_cartograph_tpu.tools.traj_projection import (
    TrajProjectionWorkflow,
    traj_projection,
)
