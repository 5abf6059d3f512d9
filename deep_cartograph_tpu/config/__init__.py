from deep_cartograph_tpu.config.schemas import (
    AnalyzeGeometrySchema,
    ComputeFeaturesSchema,
    DeepCartograph,
    FilterFeaturesSchema,
    TrainColvarsSchema,
    TrajAugmentationSchema,
    TrajClusterSchema,
    TrajProjectionSchema,
)
