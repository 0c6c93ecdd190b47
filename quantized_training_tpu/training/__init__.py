"""Training: jitted QAT train steps, losses, checkpointing."""

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
]
