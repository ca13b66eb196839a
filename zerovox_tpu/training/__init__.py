"""Training: losses, optax optimizer, sharded train step, epoch driver."""

from .losses import tts_losses, stft_loss, masked_l1, masked_mse
from .train import (TrainBatch, TrainState, make_optimizer,
                    make_lr_schedule, loss_fn,
                    train_step, make_sharded_train_step)
from .fit import fit, make_eval_fn

__all__ = ["tts_losses", "stft_loss", "masked_l1", "masked_mse",
           "TrainBatch", "TrainState", "make_optimizer", "make_lr_schedule",
           "loss_fn", "train_step", "make_sharded_train_step", "fit",
           "make_eval_fn"]
