"""Training: jitted QAT train steps, losses, checkpointing, 8-bit Adam."""

from .optim8bit import adam8bit, scale_by_adam8bit, state_nbytes
from .trainer import (
    TrainState,
    make_train_step,
    causal_lm_loss,
    qa_loss,
    classification_loss,
    save_checkpoint,
    restore_checkpoint,
)

__all__ = [
    "TrainState",
    "make_train_step",
    "causal_lm_loss",
    "qa_loss",
    "classification_loss",
    "save_checkpoint",
    "restore_checkpoint",
    "adam8bit",
    "scale_by_adam8bit",
    "state_nbytes",
]
