"""Drop-in re-exports for reference modules/ml/ml.py (Lightning callbacks).

In the TPU build the three callbacks' behaviors are folded into
deep_cartograph_tpu.models.training.Trainer: KL annealing schedules
(KLAnnealing), the delayed ReduceLROnPlateau stepper, and the
post-annealing best-checkpoint selection rule
(TrainerConfig.post_annealing_checkpoint). The reference class names are
kept so callback-configuring code keeps importing.
"""
import os

from deep_cartograph_tpu.models.training import (  # noqa: F401
    KLAnnealing,
    ReduceLROnPlateau,
    Trainer,
)

# Reference names (ml.py:51, :243) for the same schedules.
KLAAnnealing = KLAnnealing
LROnPlateauManager = ReduceLROnPlateau


class PostAnnealingCheckpoint:
    """API-compat stand-in for reference ml.py:14-49. The TPU Trainer
    applies the same rule natively (track the best validation score only
    after annealing_end_epoch; TrainerConfig.post_annealing_checkpoint);
    this class records the configuration for code that constructs the
    Lightning callback directly."""

    def __init__(self, monitor: str, dirpath: str, annealing_end_epoch: int):
        self.monitor = monitor
        self.dirpath = dirpath
        self.annealing_end_epoch = annealing_end_epoch
        self.best_score = float("inf")
        self.best_model_path = ""
        os.makedirs(self.dirpath, exist_ok=True)
