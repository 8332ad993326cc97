"""Training: on-device target assignment, losses, optimizer/schedule, and
the pjit data-parallel train step."""

from .trainer import Trainer, make_lr_schedule, make_optimizer  # noqa: F401
