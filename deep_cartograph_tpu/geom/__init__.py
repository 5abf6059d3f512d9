from deep_cartograph_tpu.geom.kernels import (
    PlanEvaluator,
    dihedral_angles,
    group_centers,
    kabsch_align,
    kabsch_rotation,
    pair_distances,
    rmsd_per_frame,
)
