"""Training runtime: Trainer loop, TrainState, callbacks, loggers."""

from mmlearn_tpu.trainer.callbacks import (
    Callback,
    LearningRateMonitor,
    ModelCheckpoint,
    Timer,
)
from mmlearn_tpu.trainer.loggers import (
    ConsoleLogger,
    JSONLLogger,
    Logger,
    TensorBoardLogger,
    WandbLogger,
)
from mmlearn_tpu.trainer.averaging import average_checkpoints
from mmlearn_tpu.trainer.state import TrainState
from mmlearn_tpu.trainer.trainer import Trainer

__all__ = [
    "Callback",
    "average_checkpoints",
    "ConsoleLogger",
    "JSONLLogger",
    "LearningRateMonitor",
    "Logger",
    "ModelCheckpoint",
    "Timer",
    "TensorBoardLogger",
    "TrainState",
    "Trainer",
    "WandbLogger",
]
