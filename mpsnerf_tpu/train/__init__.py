from mpsnerf_tpu.train.trainer import (
    TrainState,
    Trainer,
    TrainConfig,
    make_train_step,
    lr_schedule,
)
from mpsnerf_tpu.train.checkpoint import save_checkpoint, restore_latest

__all__ = [
    "TrainState", "Trainer", "TrainConfig", "make_train_step", "lr_schedule",
    "save_checkpoint", "restore_latest",
]
