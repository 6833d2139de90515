"""Training orchestration: optimizer, steps, checkpoints, metrics, Trainer.

Replaces the reference's Lightning + Hydra + WandB stack (train.py,
tricolo_net.py step hooks, callbacks/) with a jit-first loop: one compiled
train step over the data-parallel mesh, one compiled eval step, host-side
epoch orchestration, msgpack checkpoints with top-k-by-metric retention and
a JSONL (optionally WandB) metric stream.
"""

from .optim import lr_for_epoch, make_optimizer
from .state import TrainState
from .steps import make_eval_step, make_train_step
from .checkpoint import (
    AsyncCheckpointWriter,
    CheckpointManager,
    load_checkpoint,
    save_checkpoint,
    snapshot_state,
)
from .logger import MetricsLogger
from .trainer import Trainer

__all__ = [
    "Trainer",
    "TrainState",
    "make_train_step",
    "make_eval_step",
    "make_optimizer",
    "lr_for_epoch",
    "CheckpointManager",
    "AsyncCheckpointWriter",
    "save_checkpoint",
    "load_checkpoint",
    "snapshot_state",
    "MetricsLogger",
]
