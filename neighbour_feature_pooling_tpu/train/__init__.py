"""Jit-compiled training engine."""

from .checkpoint import restore_checkpoint, save_checkpoint  # noqa: F401
from .engine import (  # noqa: F401
    TrainState,
    create_train_state,
    cross_entropy_loss,
    freeze_mask,
    make_eval_step,
    make_train_step,
)
from .metrics import (  # noqa: F401
    confusion_matrix_update,
    init_confusion,
    metrics_from_confusion,
)
from .trainer import Trainer, TrainerConfig  # noqa: F401
