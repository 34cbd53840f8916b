"""Training loop: TrainState, sharded train step, fit()."""

from enhax.train.trainer import TrainState, Trainer, make_train_step, make_eval_step
from enhax.train.checkpoints import save_checkpoint, load_checkpoint, latest_checkpoint
from enhax.train.hooks import (DebugImageHook, EarlyStopHook, SWAHook,
                               TensorBoardHook, ProgressiveTrainingHook)
