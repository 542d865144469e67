"""Training: pjit U-Net trainer with orbax checkpoints."""

from .trainer import TrainConfig, Trainer, TrainState, masked_xent_loss

__all__ = ["TrainConfig", "Trainer", "TrainState", "masked_xent_loss"]
