"""Training runtime: pjit train step, optimizers, schedules, checkpoints."""

from .optim import (
    adamwscale,
    build_optimizer,
    build_schedule,
    muon_transform,
    newton_schulz_orthogonalize,
)
from .train_loop import (
    TrainState,
    Trainer,
    init_train_state,
    make_eval_step,
    make_loss_fn,
    make_train_step,
)

__all__ = [
    "adamwscale", "build_optimizer", "build_schedule", "muon_transform",
    "newton_schulz_orthogonalize", "TrainState", "Trainer",
    "init_train_state", "make_eval_step", "make_loss_fn", "make_train_step",
]
