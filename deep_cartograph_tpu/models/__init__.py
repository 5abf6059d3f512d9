from deep_cartograph_tpu.models.networks import (
    AutoEncoderCV,
    DeepTICANet,
    FeedForward,
    VAECV,
)
from deep_cartograph_tpu.models.training import (
    KLAnnealing,
    Trainer,
    TrainerConfig,
    TrainResult,
)
