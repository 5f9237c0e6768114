"""Training: losses, optimizer state, sharded train step, checkpointing."""

from gaussian_ray_tracing_tpu.train.losses import l1_loss, l2_loss, psnr_loss
from gaussian_ray_tracing_tpu.train.trainer import TrainState, make_train_step, Trainer

__all__ = ["l1_loss", "l2_loss", "psnr_loss", "TrainState", "make_train_step", "Trainer"]
