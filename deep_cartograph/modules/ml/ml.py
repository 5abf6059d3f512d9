from deep_cartograph_tpu.models.training import (  # noqa: F401
    KLAnnealing,
    ReduceLROnPlateau,
    Trainer,
)
