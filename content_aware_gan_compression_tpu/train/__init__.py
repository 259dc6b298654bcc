"""Distillation retraining (reference train.py): GAN loss + content-masked
knowledge distillation with lazy R1/path-length regularization, as jitted
SPMD step functions over the data mesh."""

from .config import TrainConfig
from .loop import Trainer, load_training_checkpoint
from .losses import (
    d_logistic_loss,
    g_nonsaturating_loss,
    kd_loss,
)
from .steps import (make_train_steps, make_multi_step, ema_accumulate,
                    make_optimizers)

__all__ = [
    "TrainConfig",
    "Trainer",
    "load_training_checkpoint",
    "d_logistic_loss",
    "g_nonsaturating_loss",
    "kd_loss",
    "make_train_steps",
    "make_multi_step",
    "ema_accumulate",
    "make_optimizers",
]
