from .ml import *  # noqa: F401,F403
from .ml import (  # noqa: F401
    KLAAnnealing,
    KLAnnealing,
    LROnPlateauManager,
    PostAnnealingCheckpoint,
    ReduceLROnPlateau,
    Trainer,
)
