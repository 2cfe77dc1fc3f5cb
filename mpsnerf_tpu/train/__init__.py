from mpsnerf_tpu.train.trainer import (
    TrainState,
    Trainer,
    TrainConfig,
    make_train_step,
    lr_schedule,
    lr_at_step,
    adam_apply,
)
from mpsnerf_tpu.train.checkpoint import save_checkpoint, restore_latest

__all__ = [
    "TrainState", "Trainer", "TrainConfig", "make_train_step", "lr_schedule",
    "lr_at_step", "adam_apply",
    "save_checkpoint", "restore_latest",
]
