from motionrag_tpu.training.optim import (
    trainable_mask,
    build_optimizer,
    path_tokens,
)
from motionrag_tpu.training.trainer import Trainer, TrainState

__all__ = ["trainable_mask", "build_optimizer", "path_tokens", "Trainer", "TrainState"]
